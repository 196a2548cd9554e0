"""HTML extraction over DataFrames: the reference's BeautifulSoup
selector dispatch re-expressed as an Arrow-batched ``mapInPandas`` kernel
over the real DOM engine in ``functions.htmldom``.

Mirrored behaviors (cited into /root/reference):
- selector dispatch + per-site selector lists: any_scraper.py:332-460
- ``select_one`` title ladder + ``get_text(strip=True)``: any_scraper.py:509-535
- multi-selector union accumulation: test_kimono.py:330-335
- attribute harvesting (``img.get('src')`` etc.): any_scraper.py:378-383,430-443

Scale shape: parsing is per-row and embarrassingly parallel — the kernel
runs inside ``mapInPandas`` so raw HTML never crosses the driver, batches
are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, and the
HTML column can be dropped before any shuffle (project-early)."""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..functions.htmldom import get_text, parse_html, select, select_ladder, select_one


@dataclass(frozen=True)
class HtmlSpec:
    """One extraction column.

    mode:
      - ``text_first``  — ``select_one(sel).get_text(strip=True)``  → string
      - ``text_ladder`` — reference title ladder: selectors tried in order
        (``selector`` is a comma-joined ladder, NOT a CSS union) → string
      - ``text_all``    — text of every match, document order → array<string>
      - ``attr_first``  — ``attr`` of the first match → string
      - ``attr_all``    — ``attr`` of every match (null/absent skipped),
        document order → array<string>
      - ``count``       — number of matches → int
    """

    out_col: str
    selector: str
    mode: str = "text_first"
    attr: str | None = None


_MODE_TYPE = {
    "text_first": StringType(),
    "text_ladder": StringType(),
    "attr_first": StringType(),
    "text_all": ArrayType(StringType()),
    "attr_all": ArrayType(StringType()),
    "count": IntegerType(),
}


def html_extract(
    df: DataFrame,
    specs: list[HtmlSpec],
    html_col: str = "html",
    drop_html: bool = True,
    fanout: bool | str = False,
) -> DataFrame:
    """Parse ``html_col`` once per row and emit one column per spec.

    ``fanout``: parsing is CPU-bound Python — when the upstream is a few
    fat partitions (one parquet file, a single fetched listing), the
    kernel would run serially. ``fanout=True`` hash-repartitions to
    ``spark.sparkContext.defaultParallelism`` first (pass a column name to
    partition by that key); the small pre-parse rows make this shuffle
    cheap relative to the parse it parallelizes. Leave False when the
    input is already well-partitioned (the 100 TB case)."""
    if fanout:
        n = df.sparkSession.sparkContext.defaultParallelism
        df = df.repartition(n, fanout) if isinstance(fanout, str) else df.repartition(n)
    for spec in specs:
        if spec.mode not in _MODE_TYPE:
            raise ValueError(f"unknown mode: {spec.mode}")
        if spec.mode.startswith("attr") and not spec.attr:
            raise ValueError(f"{spec.out_col}: attr modes need attr=")

    kept = [f for f in df.schema.fields if not (drop_html and f.name == html_col)]
    out_schema = StructType(
        kept + [StructField(s.out_col, _MODE_TYPE[s.mode]) for s in specs]
    )

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            cols = {s.out_col: [] for s in specs}
            for html in pdf[html_col]:
                root = None if html is None else parse_html(html)  # parse once per row
                for s in specs:
                    cols[s.out_col].append(
                        None if root is None else _extract_from_root(root, s)
                    )
            out = pdf.drop(columns=[html_col]) if drop_html else pdf.copy()
            for s in specs:
                out[s.out_col] = cols[s.out_col]
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def _extract_from_root(root, spec: HtmlSpec):
    if spec.mode == "text_first":
        node = select_one(root, spec.selector)
        return None if node is None else get_text(node, strip=True)
    if spec.mode == "text_ladder":
        node = select_ladder(root, [s.strip() for s in spec.selector.split(",")])
        return None if node is None else get_text(node, strip=True)
    if spec.mode == "attr_first":
        node = select_one(root, spec.selector)
        return None if node is None else node.get(spec.attr)
    if spec.mode == "text_all":
        return [get_text(n, strip=True) for n in select(root, spec.selector)]
    if spec.mode == "attr_all":
        vals = [n.get(spec.attr) for n in select(root, spec.selector)]
        return [v for v in vals if v is not None]
    return len(select(root, spec.selector))
