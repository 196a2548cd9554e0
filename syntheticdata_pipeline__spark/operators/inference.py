"""Model-inference UDF surface (SURVEY.md §2.10, U1-U5).

The reference's "UDF layer" is GPU model invocation: Qwen2-VL analysis
(qwen_vl_processor.py:39-108), InstructPix2Pix edits
(edit_model_pipeline.py:33-77), FLUX text-to-image
(AsyncImageGen/src/generator.py:61-82). The engine's realization:

- **Per-executor model singleton** — loaded once per Python worker via a
  module-level cache, not per record (the reference's orchestrator
  reloads the VLM per pair, pipeline_orchestrator.py:254 — a known
  inefficiency SURVEY §4 calls out; the resident pattern follows
  edit_model_pipeline.py:27-31 instead).
- **Arrow-batched mapInPandas** — payloads stream in Arrow batches;
  nothing passes through the driver.
- **Schema-enforced JSON output** (T10): model text → first-{...}-extract
  → from_json against a declared StructType → fallback
  ``raw_response`` struct on parse failure (qwen_vl_processor.py:177-187).

No real model ships in this container: ``model_factory`` is injectable
and tests use deterministic fakes. The plumbing (singleton lifecycle,
batch shape, schema enforcement) is the real, tested surface.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# Per-Python-worker singleton cache: {model_key: model}. Survives across
# batches and tasks within one worker process — the "load once per
# executor" pattern.
_MODEL_CACHE: dict[str, object] = {}


def _get_model(key: str, factory: Callable[[], object]):
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = factory()
    return _MODEL_CACHE[key]


def infer_text(
    df: DataFrame,
    input_col: str,
    model_factory: Callable[[], Callable[[str], str]],
    model_key: str,
    output_col: str = "response",
) -> DataFrame:
    """U1/U3-shape: text-in → text-out inference with a per-executor
    singleton. ``model_factory()`` must return a callable str→str."""
    import pandas as pd

    out_schema = StructType.fromDDL(
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + f", {output_col} string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(model_key, model_factory)  # singleton per worker
        for pdf in batches:
            pdf = pdf.copy()
            pdf[output_col] = [model(x) for x in pdf[input_col]]
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def parse_model_json(
    response: Column,
    schema: StructType,
    parsed_col: str = "parsed",
    raw_col: str = "raw_response",
) -> list[Column]:
    """T10: rescue the first {...} block from free-form model output,
    parse against ``schema``, fall back to raw text (the PERMISSIVE
    corrupt-record idiom). Returns [parsed_struct, raw_fallback].

    Conservation contract (r13, queued fix #6): a malformed block used
    to come back as an ALL-NULL struct — not NULL — so the raw fallback
    never fired and the response text was LOST. The corrupt-record
    column is now threaded through ``from_json`` so the fallback keys on
    parse-failure EVIDENCE, not struct nullity: a corrupt block that
    salvaged NOTHING yields (parsed=NULL, raw=the full response),
    exactly like the no-block cases. A corrupt block that salvaged SOME
    field keeps the partial struct with raw=NULL — the half-parsed pin
    (PERMISSIVE also flags field-level coercion failures as corrupt, so
    corrupt evidence alone must not discard a usable partial parse).
    Reference contract: qwen_vl_processor.py:184-187 catches
    JSONDecodeError and keeps the raw text.
    """
    from pyspark.sql.types import StringType, StructField

    corrupt = "_corrupt"
    while corrupt in schema.fieldNames():
        corrupt = "_" + corrupt
    aug = StructType(list(schema.fields) + [StructField(corrupt, StringType())])
    block = F.regexp_extract(response, r"(\{[\s\S]*\})", 1)
    parsed_all = F.from_json(
        F.nullif(block, F.lit("")),
        aug,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt},
    )
    nothing_salvaged = F.lit(True)
    for f in schema.fields:
        nothing_salvaged = nothing_salvaged & parsed_all[f.name].isNull()
    bad = parsed_all.isNull() | (parsed_all[corrupt].isNotNull() & nothing_salvaged)
    clean = F.struct(*[parsed_all[f.name].alias(f.name) for f in schema.fields])
    return [
        F.when(~bad, clean).alias(parsed_col),
        F.when(bad, response).otherwise(F.lit(None).cast("string")).alias(raw_col),
    ]


def accept_reject_filter(
    df: DataFrame,
    input_col: str,
    model_factory: Callable[[], Callable[[str], bool]],
    model_key: str,
    keep_accepted: bool = True,
) -> DataFrame:
    """U5: rubric accept/reject model filter (robust_scraper.py:96-109) —
    a boolean model verdict used as a filter predicate."""
    import pandas as pd

    out_schema = StructType.fromDDL(
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", accepted boolean"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = _get_model(model_key, model_factory)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["accepted"] = [bool(model(x)) for x in pdf[input_col]]
            yield pdf

    out = df.mapInPandas(kernel, schema=out_schema)
    return out.filter(F.col("accepted") == F.lit(keep_accepted))
