"""Column-expression library: scalar functions (SURVEY.md §2.7-§2.8).

Everything here is a pure Spark Column expression (JVM-side, codegen-able)
— never a row-at-a-time Python UDF.
"""
