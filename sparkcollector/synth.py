"""Deterministic synthetic transcript generator.

Produces the BASELINE.json ``input_hint`` table shape —
``(conv_id, turn_idx, role, text, tool, ts)`` — with text content that
gives the parse stage real work (FIXTURES.md §1.1), modeled on the
log shapes the reference's filelog pipeline parses
(cmd/otelcol/config/collector/splunk_logs_config_linux.yaml:185-220):

* a ``level=SEV`` token in ~40% of turns (stanza severity parser),
* a ``CALL tool(args=..) -> status=.. dur=..ms`` marker on tool turns
  (named-group regex extraction, apache-access style, yaml:185-189),
* a ``span id=.. parent=.. op=..`` marker in ~15% of turns,
* an apache-style ``[%d/%b/%Y:%H:%M:%S +0000]`` timestamp fragment in
  ~25% of turns,
* plain prose otherwise (no match ⇒ NULL extraction, row kept).

Everything is vectorized numpy off a seeded Generator — identical
output for identical (seed, n_turns), no external data.  Conversation
sizes are Zipf-skewed so a few "hot" conv_ids exist to exercise the
salted aggregation path (SURVEY.md §7.3 hard part 4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
# role sampling probabilities: conversations are mostly user/assistant
ROLE_P = np.array([0.35, 0.40, 0.05, 0.20])
TOOLS = np.array(["bash", "read", "write", "search", "none"])
SEVERITIES = np.array(["TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"])
SEV_P = np.array([0.05, 0.20, 0.45, 0.18, 0.10, 0.02])
OPS = np.array(["plan", "exec", "retry", "summarize", "verify", "route"])
WORDS = np.array(
    "the quick agent ran a tool and observed output then decided to "
    "continue with analysis of the log stream while keeping state "
    "small fast table scan merge batch window query join filter".split()
)

BASE_TS = np.datetime64("2025-01-01T00:00:00", "us")


def generate_pandas(n_turns: int, seed: int = 42) -> pd.DataFrame:
    """Generate ``n_turns`` transcript turns as a pandas DataFrame."""
    rng = np.random.default_rng(seed)

    # --- conversation structure: Zipf-skewed sizes -------------------
    # Draw conv sizes from a Zipf(1.3) capped distribution until we
    # cover n_turns; a handful of conversations get very long (hot keys).
    sizes = []
    total = 0
    while total < n_turns:
        s = int(min(rng.zipf(1.3), 5000))
        sizes.append(s)
        total += s
    sizes[-1] -= total - n_turns
    if sizes[-1] == 0:
        sizes.pop()
    sizes = np.array(sizes, dtype=np.int64)
    n_conv = len(sizes)

    conv_ord = rng.permutation(n_conv)  # decorrelate size from id
    conv_ids_unique = np.array([f"conv-{i:08d}" for i in range(n_conv)])
    conv_idx = np.repeat(conv_ord, sizes)
    conv_id = conv_ids_unique[conv_idx]
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])

    n = n_turns
    role = ROLES[rng.choice(len(ROLES), size=n, p=ROLE_P)]
    # tool turns get a real tool; others 'none'
    tool = np.where(
        role == "tool", TOOLS[rng.integers(0, 4, size=n)], "none"
    )

    # --- timestamps: per-conversation start + monotone offsets -------
    conv_start_s = rng.uniform(0, 6 * 3600, size=n_conv)  # 6h span
    gaps = rng.exponential(20.0, size=n) + 0.5  # seconds between turns
    within = np.concatenate(
        [np.cumsum(gaps[off : off + s]) for off, s in zip(
            np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes
        )]
    )
    ts_s = conv_start_s[conv_idx] + within
    ts = BASE_TS + (ts_s * 1_000_000).astype("timedelta64[us]")

    # --- text grammar -------------------------------------------------
    prose_w = WORDS[rng.integers(0, len(WORDS), size=(n, 8))]
    prose = np.array([" ".join(r) for r in prose_w])

    has_sev = rng.random(n) < 0.40
    sev = SEVERITIES[rng.choice(len(SEVERITIES), size=n, p=SEV_P)]
    sev_frag = np.where(has_sev, np.char.add("level=", sev), "")

    is_tool = tool != "none"
    status = np.where(rng.random(n) < 0.9, "ok", "err")
    dur = rng.integers(1, 5000, size=n)
    argn = rng.integers(0, 100, size=n)
    call_frag = np.where(
        is_tool,
        "CALL "
        + pd.Series(tool).astype(str)
        + "(args=a"
        + pd.Series(argn).astype(str)
        + ") -> status="
        + pd.Series(status).astype(str)
        + " dur="
        + pd.Series(dur).astype(str)
        + "ms",
        "",
    )

    has_span = rng.random(n) < 0.15
    span_id = np.array(
        [f"{v:016x}" for v in rng.integers(1, 2**60, size=n)]
    )
    parent = np.where(
        rng.random(n) < 0.5,
        np.array([f"{v:016x}" for v in rng.integers(1, 2**60, size=n)]),
        "-",
    )
    op = OPS[rng.integers(0, len(OPS), size=n)]
    span_frag = np.where(
        has_span,
        "span id=" + pd.Series(span_id).astype(str)
        + " parent=" + pd.Series(parent).astype(str)
        + " op=" + pd.Series(op).astype(str),
        "",
    )

    has_lts = rng.random(n) < 0.25
    lts = pd.Series(ts).dt.strftime("[%d/%b/%Y:%H:%M:%S +0000]")
    lts_frag = np.where(has_lts, lts.to_numpy(dtype=object), "")

    text = (
        pd.Series(prose).str.cat(
            [pd.Series(sev_frag), pd.Series(call_frag),
             pd.Series(span_frag), pd.Series(lts_frag)],
            sep=" ",
        )
        .str.replace(r"\s+", " ", regex=True)
        .str.strip()
    )

    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.to_numpy(dtype=object),
            "tool": tool,
            "ts": pd.Series(ts),
        }
    )


def write_parquet(path: str, n_turns: int, seed: int = 42) -> None:
    """Materialize a deterministic transcripts table as parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = generate_pandas(n_turns, seed)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    # int32 turn_idx per input_hint
    table = table.set_column(
        table.schema.get_field_index("turn_idx"),
        "turn_idx",
        table.column("turn_idx").cast(pa.int32()),
    )
    pq.write_table(table, path)


TRANSCRIPT_DDL_COLS = (
    "conv_id STRING, turn_idx INT, role STRING, text STRING, "
    "tool STRING, ts TIMESTAMP"
)


def register_bucketed_table(
    spark, location: str, buckets: int = 32, name: str = "transcripts_bucketed"
) -> str:
    """(Re-)register a conv_id-bucketed external transcripts table.

    The files at ``location`` must have been written bucketed (see
    :func:`write_bucketed_table`); bucket ids live in the file names,
    so re-declaring the table in a fresh session is metadata-only.
    This is the sandbox stand-in for an Iceberg table with a
    ``bucket(B, conv_id)`` partition transform — the production layout
    that lets every pipeline run skip the conv_id shuffle.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({TRANSCRIPT_DDL_COLS}) USING parquet "
        f"CLUSTERED BY (conv_id) INTO {buckets} BUCKETS "
        f"LOCATION '{location}'"
    )
    return name


def write_bucketed_table(
    spark, flat_parquet: str, location: str, buckets: int = 32
) -> str:
    """Materialize the transcripts bucketed by conv_id (one-time cost,
    amortized over every subsequent shuffle-free pipeline run)."""
    name = register_bucketed_table(spark, location, buckets)
    spark.read.parquet(flat_parquet).createOrReplaceTempView("_flat_turns")
    # DISTRIBUTE BY conv_id with shuffle.partitions == buckets gives
    # each write task exactly one bucket's rows (both use
    # pmod(murmur3, n)), so every bucket lands in ONE well-compressed
    # file instead of one sliver per insert task — the difference
    # between 32 ~10 MB files and 512 ~1 MB ones at 8M turns.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(buckets))
        spark.sql(
            f"INSERT OVERWRITE TABLE {name} "
            "SELECT conv_id, turn_idx, role, text, tool, ts FROM _flat_turns "
            "DISTRIBUTE BY conv_id SORT BY conv_id, turn_idx"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return name
