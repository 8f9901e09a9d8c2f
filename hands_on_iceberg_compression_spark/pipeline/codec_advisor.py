"""Per-column codec advisor: measure, then choose.

The reference benchmarks compression table-wide (``src/config/codecs.ts``
matrix); round 3 measured that the right codec is a per-COLUMN decision
(PERF.md: zstd-1 on high-entropy strings decodes ~4x faster than zstd-6 and
costs +0.7% storage, while low-entropy numerics keep zstd-6's ratio).  This
module closes the loop: sample a table's columns, compress each column chunk
under every candidate codec with pyarrow, measure encoded bytes AND decode
time, and emit the per-column codec map that
``warehouse.rewrite_per_column_codec`` consumes.

Scale shape: the advisor runs on a bounded driver-side sample (one Arrow
table of SAMPLE_ROWS rows — a few MB), never the full table; the decision it
produces is then applied distributively (one rewrite task per file).  On a
cluster the sampling read is a LIMIT pushed to one input split.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

CANDIDATES: tuple[tuple[str, int | None], ...] = (
    ("zstd", 1),
    ("zstd", 6),
    ("lz4", None),
    ("snappy", None),
)

SAMPLE_ROWS = 100_000
# prefer a faster codec only when it costs at most this much extra storage
# vs the smallest candidate (the round-3 measurement: zstd-1 on hex strings
# was +<1% for 4x decode speed — well inside this budget)
SIZE_TOLERANCE = 0.05


@dataclass(frozen=True)
class ColumnAdvice:
    column: str
    codec: str
    level: int | None
    encoded_bytes: int
    decode_ms: float
    best_bytes: int  # the smallest candidate's size, for the tolerance math


def _bench_column(arr, codec: str, level: int | None) -> tuple[int, float]:
    """Encode one Arrow column under (codec, level); return (bytes, decode_ms)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({"c": arr})
    buf = io.BytesIO()
    pq.write_table(
        table,
        buf,
        compression=codec.upper() if codec != "uncompressed" else "NONE",
        compression_level=level,
        use_deprecated_int96_timestamps=False,
    )
    encoded = buf.getvalue()
    # decode timing: best of 3 full reads of the in-memory file
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        pq.read_table(io.BytesIO(encoded))
        best = min(best, time.perf_counter() - t0)
    return len(encoded), best * 1000.0


def advise(df, sample_rows: int = SAMPLE_ROWS) -> dict[str, ColumnAdvice]:
    """Per-column codec recommendations for a DataFrame's schema.

    Policy: among candidates within SIZE_TOLERANCE of the smallest encoding,
    pick the fastest decoder.  Deterministic given the sample (LIMIT over
    the input order; fixtures are single files, so the sample is stable)."""
    sample = df.limit(sample_rows).toArrow()
    out: dict[str, ColumnAdvice] = {}
    for name in sample.column_names:
        arr = sample.column(name)
        results = {
            (codec, level): _bench_column(arr, codec, level)
            for codec, level in CANDIDATES
        }
        best_bytes = min(b for b, _ in results.values())
        admissible = {
            k: v for k, v in results.items()
            if v[0] <= best_bytes * (1 + SIZE_TOLERANCE)
        }
        (codec, level), (nbytes, dec_ms) = min(
            admissible.items(), key=lambda kv: (kv[1][1], kv[1][0])
        )
        out[name] = ColumnAdvice(name, codec, level, nbytes, dec_ms, best_bytes)
    return out


def overrides_from_advice(
    advice: dict[str, ColumnAdvice], default: tuple[str, int | None]
) -> dict[str, tuple[str, int | None]]:
    """Reduce advice to the override map rewrite_per_column_codec consumes —
    only columns whose recommendation differs from the table default."""
    return {
        a.column: (a.codec, a.level)
        for a in advice.values()
        if (a.codec, a.level) != default
    }
