"""Spark extraction operator: pages DataFrame → extracted DataFrame.

The Spark trace of ``PaddleOCR().ocr(img)`` (SURVEY.md §3.1): scan →
ONE ``mapInArrow`` stage running the fused tokenize→score→merge per
Arrow batch → write. Design points (SURVEY.md §4):

 * one JVM↔Python crossing per Arrow batch (vs the reference's two
   native-runtime crossings per image, predict_det.py:242-247 and
   predict_rec.py:599-618);
 * Catalyst column pruning: we select exactly ``(url, html)`` (+
   passthrough cols) before the UDF so the parquet scan reads only
   those (the KeepKeys analog, ppocr/data/imaug/operators.py:126-134);
 * salted repartition on ``xxhash64(url, salt)`` replaces the
   reference's static modulo sharding
   (predict_system.py:149,259-270) and defuses host-domain skew;
 * per-partition lineage rows (the ``time_dict`` analog,
   predict_system.py:68-119) are emitted from the same UDF as extra
   rows with a discriminator column and split afterwards — no second
   pass over the html.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.compute as pc
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webextract.config import DEFAULT_CONFIG, ExtractConfig
from webextract.functions.extract import extract_page

SPAN_TYPE = T.StructType(
    [
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("tag", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_TYPE), True),
        T.StructField("mean_score", T.DoubleType(), True),
        T.StructField("blocks_total", T.IntegerType(), True),
        T.StructField("blocks_kept", T.IntegerType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("truncated", T.BooleanType(), True),
    ]
)

# unified schema when lineage rows ride along (rec_type discriminator)
UNIFIED_SCHEMA = T.StructType(
    [T.StructField("rec_type", T.StringType(), False)]
    + EXTRACTED_SCHEMA.fields
    + [
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("urls_in", T.LongType(), True),
        T.StructField("lineage_bytes_in", T.LongType(), True),
        T.StructField("lineage_blocks_kept", T.LongType(), True),
        T.StructField("extract_ms", T.DoubleType(), True),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("urls_in", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("blocks_kept", T.LongType(), True),
        T.StructField("extract_ms", T.DoubleType(), True),
    ]
)


# Arrow output schema mirroring EXTRACTED_SCHEMA (built once; the
# mapInArrow path constructs arrays directly — no pandas object columns,
# which halves the per-batch ser-de cost vs mapInPandas)
_SPAN_PA = pa.list_(
    pa.struct(
        [
            ("block_id", pa.int32()),
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("tag", pa.string()),
            ("score", pa.float64()),
        ]
    )
)


def _spans_array(results: list[dict]) -> pa.ListArray:
    """spans as a ListArray built from flattened primitive columns —
    one pass, no per-span dict objects (the hot-path shape: a 2M-page
    batch job builds millions of spans)."""
    offsets = [0]
    b_ids: list[int] = []
    starts: list[int] = []
    ends: list[int] = []
    tags: list[str] = []
    scores: list[float] = []
    n = 0
    for r in results:
        for (b, s, e, t, sc) in r["spans"]:
            b_ids.append(b)
            starts.append(s)
            ends.append(e)
            tags.append(t)
            scores.append(sc)
        n += len(r["spans"])
        offsets.append(n)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(b_ids, type=pa.int32()),
            pa.array(starts, type=pa.int32()),
            pa.array(ends, type=pa.int32()),
            pa.array(tags, type=pa.string()),
            pa.array(scores, type=pa.float64()),
        ],
        ["block_id", "start", "end", "tag", "score"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)


def _extract_record_batch(rb: pa.RecordBatch, cfg: ExtractConfig) -> pa.RecordBatch:
    """One Arrow batch of (url, html) → extracted batch, all-pyarrow."""
    results = [extract_page(h, cfg) for h in rb.column(1).to_pylist()]
    return pa.RecordBatch.from_arrays(
        [
            rb.column(0),
            pa.array([r["text"] for r in results], type=pa.string()),
            _spans_array(results),
            pa.array([r["mean_score"] for r in results], type=pa.float64()),
            pa.array([r["blocks_total"] for r in results], type=pa.int32()),
            pa.array([r["blocks_kept"] for r in results], type=pa.int32()),
            pa.array([r["bytes_in"] for r in results], type=pa.int64()),
            pa.array([r["truncated"] for r in results], type=pa.bool_()),
        ],
        [f.name for f in EXTRACTED_SCHEMA.fields],
    )


def extract_pages(
    pages: DataFrame,
    cfg: ExtractConfig = DEFAULT_CONFIG,
    sort_by_size: bool = False,
) -> DataFrame:
    """pages(url, html, ...) → extracted(url, text, spans, ...).

    Pure results path (no lineage rows); ``select`` first so Catalyst
    prunes the scan to (url, html). Runs as ``mapInArrow`` — the UDF
    consumes/produces Arrow record batches directly (no pandas
    conversion on either side of the worker boundary).

    ``sort_by_size=True`` sorts within partitions by html length so
    Arrow batches are cost-homogeneous — the analog of the reference's
    aspect-ratio sort before recognition batching
    (tools/infer/predict_rec.py:385-398): no shuffle, cheap, and evens
    out batch latency when page sizes are heavy-tailed.
    """
    src = pages.select("url", "html")
    if sort_by_size:
        src = src.sortWithinPartitions(F.length("html"))

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows:
                yield _extract_record_batch(rb, cfg)

    return src.mapInArrow(run, EXTRACTED_SCHEMA)


def to_json_lines(extracted: DataFrame) -> DataFrame:
    """(url, json) result lines — the reference's results-sink format
    ``name \\t json(boxes, transcriptions)`` (predict_system.py:204-215,
    250-254) as a DataFrame: write with ``.write.text`` or csv after
    concat. JVM-side ``to_json`` over the nested struct."""
    payload = F.to_json(
        F.struct("text", "spans", "mean_score", "blocks_kept")
    )
    return extracted.select("url", payload.alias("result_json"))


def extract_pages_with_lineage(
    pages: DataFrame, cfg: ExtractConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Same, plus one lineage row per non-empty task partition, emitted
    inline with ``rec_type='lineage'``. Split afterwards with
    :func:`split_lineage` (persist the unified frame first if both
    halves are consumed). mapInArrow like the pure path."""
    page_pa = {
        "url": pa.string(),
        "text": pa.string(),
        "spans": _SPAN_PA,
        "mean_score": pa.float64(),
        "blocks_total": pa.int32(),
        "blocks_kept": pa.int32(),
        "bytes_in": pa.int64(),
        "truncated": pa.bool_(),
    }
    lineage_pa = {
        "partition_id": pa.int32(),
        "urls_in": pa.int64(),
        "lineage_bytes_in": pa.int64(),
        "lineage_blocks_kept": pa.int64(),
        "extract_ms": pa.float64(),
    }
    lineage_names = list(lineage_pa)
    names = [f.name for f in UNIFIED_SCHEMA.fields]

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        t0 = time.perf_counter()
        urls_in = 0
        bytes_in = 0
        blocks_kept = 0
        any_rows = False
        for rb in batches:
            if not rb.num_rows:
                continue
            any_rows = True
            out = _extract_record_batch(rb, cfg)
            n = out.num_rows
            urls_in += n
            bytes_in += int(pc.sum(out.column(6)).as_py() or 0)
            blocks_kept += int(pc.sum(out.column(5)).as_py() or 0)
            arrays = [pa.array(["page"] * n, type=pa.string())] + list(
                out.columns
            ) + [pa.nulls(n, type=lineage_pa[c]) for c in lineage_names]
            yield pa.RecordBatch.from_arrays(arrays, names)
        if any_rows:
            ms = (time.perf_counter() - t0) * 1000.0
            lin_vals = {
                "partition_id": pid,
                "urls_in": urls_in,
                "lineage_bytes_in": bytes_in,
                "lineage_blocks_kept": blocks_kept,
                "extract_ms": ms,
            }
            arrays = (
                [pa.array(["lineage"], type=pa.string())]
                + [pa.nulls(1, type=t) for t in page_pa.values()]
                + [pa.array([lin_vals[c]], type=lineage_pa[c]) for c in lineage_names]
            )
            yield pa.RecordBatch.from_arrays(arrays, names)

    return pages.select("url", "html").mapInArrow(run, UNIFIED_SCHEMA)


def split_lineage(unified: DataFrame) -> tuple[DataFrame, DataFrame]:
    """unified → (extracted, lineage) DataFrames."""
    extracted = unified.filter(F.col("rec_type") == "page").select(
        *[f.name for f in EXTRACTED_SCHEMA.fields]
    )
    lineage = unified.filter(F.col("rec_type") == "lineage").select(
        F.col("partition_id"),
        F.col("urls_in"),
        F.col("lineage_bytes_in").alias("bytes_in"),
        F.col("lineage_blocks_kept").alias("blocks_kept"),
        F.col("extract_ms"),
    )
    return extracted, lineage


def salted_repartition(
    df: DataFrame, num_partitions: int, key: str = "url", salt: int = 0
) -> DataFrame:
    """Repartition on ``xxhash64(key, salt)`` — uniform url-hash spread
    regardless of host-domain skew (replaces the reference's
    ``files[process_id::total]`` striping, predict_system.py:149)."""
    return df.repartition(num_partitions, F.xxhash64(F.col(key), F.lit(salt)))
