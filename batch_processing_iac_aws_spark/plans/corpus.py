"""Corpus-management queries (training-data pipeline surface, north-star
extensions beyond the reference): reproducible hash-gated sampling, weighted
dataset mixing, greedy sequence packing, and PII scrubbing — each with a
DuckDB oracle built from the exact same expressions (md5-prefix compare,
window cumsum, regexp), so the determinism claims are machine-checked."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table
from ..operators.corpus import (
    _EMAIL_RE,
    _PHONE_RE,
    dataset_mixture,
    deterministic_sample,
    pack_sequences,
    scrub_pii,
)
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@query(
    "sample_deterministic",
    oracle="""
SELECT doc_id, lang
FROM documents
WHERE substr(md5('s1' || CAST(doc_id AS VARCHAR)), 1, 2) < '29'
""",
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~16% reproducible sample of the corpus, keyed on doc_id: the gate is
    a hash-prefix compare, so membership is independent of partitioning,
    parallelism, and engine — the oracle IS the reproducibility check."""
    d = _t(spark, sf_dir, "documents")
    return deterministic_sample(
        d, key_col="doc_id", keep_below_hex="29", salt="s1"
    ).select("doc_id", "lang")


@query(
    "dataset_mixture",
    oracle="""
SELECT doc_id, lang, 'en' AS mix_source FROM documents
WHERE lang = 'en'
  AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) < '80'
UNION ALL
SELECT doc_id, lang, 'rest' AS mix_source FROM documents
WHERE lang <> 'en'
  AND substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2) < '20'
""",
)
def dataset_mixture_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic corpus mix: English at ~50%, everything else
    at ~12.5% — the whole 100 TB mixture is described by two hex
    thresholds and re-materializable anywhere."""
    d = _t(spark, sf_dir, "documents")
    mixed = dataset_mixture(
        {
            "en": (d.filter(F.col("lang") == "en"), "80"),
            "rest": (d.filter(F.col("lang") != "en"), "20"),
        },
        key_col="doc_id",
    )
    return mixed.select("doc_id", "lang", "mix_source")


@query(
    "docs_balanced_shards",
    oracle="""
WITH t AS (
    SELECT doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), r AS (
    SELECT doc_id, n_tokens,
           row_number() OVER (ORDER BY n_tokens DESC, doc_id) AS rn
    FROM t
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN (rn - 1) % 16 < 8 THEN (rn - 1) % 16
                 ELSE 15 - (rn - 1) % 16 END AS INT) AS shard
FROM r
""",
)
def docs_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment (8 shards): descending-weight
    serpentine over a SCALABLE global rank (operators/ranking.py's
    range-shuffle two-pass row_number, not a one-task window) — the
    write-layout step that keeps every pretraining shard the same token
    mass. Balance quality is asserted in tests/test_corpus.py (max/min
    shard total within one max-doc-weight); this oracle pins the exact
    assignment. operators.corpus.balanced_shards."""
    from ..operators.corpus import balanced_shards

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.size(F.split(F.col("text"), r"\s+")).cast("long"),
    )
    return balanced_shards(
        d.select("doc_id", "n_tokens"),
        weight_col="n_tokens",
        id_col="doc_id",
        n_shards=8,
    ).select("doc_id", "n_tokens", "shard")


@query(
    "docs_pack_sequences",
    oracle="""
WITH t AS (
    SELECT source, doc_id,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), c AS (
    SELECT source, doc_id, n_tokens,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
    FROM t
)
SELECT source, doc_id, n_tokens,
       CAST(FLOOR(cum_before / 512) AS BIGINT) AS bin_id,
       CAST(cum_before % 512 AS BIGINT) AS bin_offset
FROM c
""",
)
def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing into 512-token bins, sharded by
    source so the running-sum window parallelizes (one window shuffle on
    the shard key — never a global single-task sort)."""
    d = _t(spark, sf_dir, "documents")
    return pack_sequences(
        d, id_col="doc_id", text_col="text", context_len=512, shard_col="source"
    )


_PII_ORACLE = """
WITH inj AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or +1 555 0100' AS t
    FROM documents
), e AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, 'EMAIL_RE')) AS BIGINT) AS n_email,
           regexp_replace(t, 'EMAIL_RE', '<EMAIL>', 'g') AS t2
    FROM inj
)
SELECT doc_id,
       regexp_replace(t2, 'PHONE_RE', '<PHONE>', 'g') AS scrubbed,
       n_email + CAST(len(regexp_extract_all(t2, 'PHONE_RE')) AS BIGINT)
           AS n_redactions
FROM e
""".replace("EMAIL_RE", _EMAIL_RE).replace("PHONE_RE", _PHONE_RE)


@query("text_pii_scrub", oracle=_PII_ORACLE)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: a deterministic email + phone is appended to each doc
    (the corpus itself contains none), then scrub_pii replaces both with
    typed placeholders and counts redactions — map-only RE2-safe regexp
    projection, verified against DuckDB's regexp engine."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1 555 0100"),
        ).alias("t"),
    )
    return scrub_pii(d, text_col="t").select(
        "doc_id", "scrubbed", "n_redactions"
    )


@query(
    "corpus_quota_cap",
    oracle="""
WITH scored AS (
    SELECT source, doc_id, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY n_chars DESC, doc_id) AS rn
    FROM documents
)
SELECT source, doc_id, n_chars FROM scored WHERE rn <= 40
""",
)
def corpus_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota governor: keep the 40 best (longest) docs per
    source — deterministic best-first capping so no domain dominates the
    mixture. operators.corpus.quota_cap: one group shuffle + in-partition
    top-k window, no global sort."""
    from ..operators.corpus import quota_cap

    d = _t(spark, sf_dir, "documents")
    return quota_cap(
        d, group_col="source", order_col="n_chars", id_col="doc_id",
        max_per_group=40,
    ).select("source", "doc_id", "n_chars")


@query(
    "dataset_split",
    oracle="""
SELECT doc_id,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                 THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment by doc_id hash.
    operators.corpus.deterministic_split — map-only, reproducible across
    engines and re-runs (the md5-prefix gate from sample_deterministic)."""
    from ..operators.corpus import deterministic_split

    d = _t(spark, sf_dir, "documents")
    return deterministic_split(d, id_col="doc_id").select("doc_id", "split")


@query(
    "sample_per_group",
    oracle="""
WITH ranked AS (
    SELECT source, doc_id, lang,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5('usg' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
SELECT source, doc_id, lang FROM ranked WHERE rn <= 10
""",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-10 uniform deterministic sample per source — reservoir
    semantics without an RNG (rank by md5 digest of the id inside each
    group). Unlike corpus_quota_cap's best-first keep, inclusion here is
    uniform, yet the kept set is identical across engines, partitionings,
    and re-runs. operators.corpus.uniform_sample_per_group."""
    from ..operators.corpus import uniform_sample_per_group

    d = _t(spark, sf_dir, "documents")
    return uniform_sample_per_group(
        d, group_col="source", id_col="doc_id", k=10
    ).select("source", "doc_id", "lang")


@query(
    "docs_token_budget",
    oracle="""
WITH t AS (
    SELECT source, doc_id, n_chars,
           CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
    FROM documents
), c AS (
    SELECT source, doc_id, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_tokens_before
    FROM t
)
SELECT source, doc_id, n_tokens, cum_tokens_before
FROM c WHERE cum_tokens_before < 2000
""",
)
def docs_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy quality-first token-budget fill: each source keeps its
    longest (n_chars-best) docs until 2 000 tokens are covered — the
    training-mix governor when the target is tokens per source, not doc
    counts. One partitioned window shuffle (never a global sort).
    operators.corpus.token_budget_cap. The whitespace count here is the
    SQL-twin-provable stand-in; production swaps in a real-vocabulary
    count upstream via operators.text.count_tokens (pluggable
    tokenize_fn, worker-side probe, deterministic in-sandbox fallback) —
    token_budget_cap takes the count as a column either way."""
    from ..operators.corpus import token_budget_cap

    d = _t(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), r"\s+")).cast("long")
    )
    return token_budget_cap(
        d,
        group_col="source",
        quality_col="n_chars",
        id_col="doc_id",
        token_col="n_tokens",
        budget=2000,
    ).select("source", "doc_id", "n_tokens", "cum_tokens_before")


from .registry import fixture_path

_BPE_MERGES_PATH = fixture_path("bpe_merges.txt")
#: regex twin of operators.text._BPE_ISH_PATTERN, quotes doubled for SQL
_BPE_PAT_SQL = (
    r"''s|''t|''re|''ve|''m|''ll|''d|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"
)


def _bpe_merges_sql_values() -> str:
    """The committed merges fixture as a SQL VALUES literal — vocabulary
    as data on the ORACLE side too, so the two engines can never read
    different vocabularies."""
    from ..operators.text import load_bpe_merges

    def q(s: str) -> str:
        return s.replace("'", "''")

    return ", ".join(
        f"({i}, '{q(x)}', '{q(y)}')"
        for i, (x, y) in enumerate(load_bpe_merges(_BPE_MERGES_PATH))
    )


try:
    _BPE_VALUES = _bpe_merges_sql_values()
except OSError:
    # executor Python workers import this module from the package zip
    # ensure_worker_imports ships, where __file__-relative fixture paths
    # point INSIDE the zip and no fixtures/ exists. The oracle string is
    # DRIVER-only (DuckDB twin), so registering without it there is
    # harmless — and a real checkout missing the fixture still fails
    # loudly via tests/test_registry.py's oracle-count assertion.
    _BPE_VALUES = None


@query(
    "docs_token_budget_bpe",
    oracle=None if _BPE_VALUES is None else f"""
WITH RECURSIVE merges(rank, x, y) AS (
    SELECT * FROM (VALUES {_BPE_VALUES}) AS m(rank, x, y)
), words AS (
    SELECT DISTINCT t.w
    FROM documents, UNNEST(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS t(w)
    WHERE text IS NOT NULL
), bpe(w, s) AS (
    -- seed: every word as chr(31)-separated characters; each step merges
    -- ALL left-to-right occurrences of the LOWEST-rank pair present (the
    -- canonical BPE apply loop; replace() is left-to-right non-overlapping,
    -- exactly the merge semantics); a word with no applicable merge emits
    -- no successor, so the recursion terminates at every word's fixpoint
    SELECT w, chr(31) || regexp_replace(w, '(.)', '\\1' || chr(31), 'g')
    FROM words
    UNION ALL
    SELECT b.w,
           replace(b.s, chr(31)||m.x||chr(31)||m.y||chr(31),
                   chr(31)||m.x||m.y||chr(31))
    FROM bpe b, LATERAL (
        SELECT x, y FROM merges
        WHERE contains(b.s, chr(31)||x||chr(31)||y||chr(31))
        ORDER BY rank LIMIT 1) m
), fixed AS (
    -- length strictly decreases per merge, so min-length = the fixpoint
    SELECT w, length(arg_min(s, length(s)))
             - length(replace(arg_min(s, length(s)), chr(31), '')) - 1 AS n
    FROM bpe GROUP BY w
), doc_tokens AS (
    SELECT d.doc_id, CAST(COALESCE(SUM(f.n), 0) AS BIGINT) AS n_tokens
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, t.w
        FROM documents, UNNEST(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS t(w)
        WHERE text IS NOT NULL
    ) occ ON d.doc_id = occ.doc_id
    LEFT JOIN fixed f ON occ.w = f.w
    GROUP BY d.doc_id
), c AS (
    SELECT d.source, d.doc_id, t.n_tokens,
           CAST(COALESCE(SUM(t.n_tokens) OVER (
               PARTITION BY d.source ORDER BY d.n_chars DESC, d.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_tokens_before
    FROM documents d JOIN doc_tokens t ON d.doc_id = t.doc_id
)
SELECT source, doc_id, n_tokens, cum_tokens_before
FROM c WHERE cum_tokens_before < 2000
""",
)
def docs_token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs_token_budget with a REAL merge-loop BPE through the
    count_tokens seam (operators/text.py:make_bpe_tokenizer): the
    committed vocabulary file drives the canonical lowest-rank-pair merge
    loop inside an Arrow-batched pandas UDF (per-word memo — cost is
    vocabulary-bounded), and the budget window runs on the resulting
    counts. The oracle REPLAYS the same merge loop in DuckDB (recursive
    CTE over distinct words), so the seam's non-fallback tokenizer is
    value-verified end-to-end, not assumed. Same plan shape as
    docs_token_budget: one map-only tokenize pass + one partitioned
    window shuffle."""
    from ..operators.corpus import token_budget_cap
    from ..operators.text import (
        count_tokens,
        load_bpe_merges,
        make_bpe_tokenizer,
    )

    tokenize = make_bpe_tokenizer(load_bpe_merges(_BPE_MERGES_PATH))
    d = count_tokens(
        _t(spark, sf_dir, "documents"), tokenize_fn=tokenize
    )
    return token_budget_cap(
        d,
        group_col="source",
        quality_col="n_chars",
        id_col="doc_id",
        token_col="n_tokens",
        budget=2000,
    ).select("source", "doc_id", "n_tokens", "cum_tokens_before")


@query(
    "dataset_mixture_epochs",
    oracle="""
SELECT doc_id, 'hiq' AS mix_source, e AS epoch
FROM documents,
     UNNEST(generate_series(0,
         2 + CASE WHEN substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2)
                       < '4d' THEN 1 ELSE 0 END - 1)) AS t(e)
WHERE source IN ('src0', 'src1')
UNION ALL
SELECT doc_id, 'mid' AS mix_source, e AS epoch
FROM documents,
     UNNEST(generate_series(0, 1 - 1)) AS t(e)
WHERE source IN ('src2', 'src3')
UNION ALL
SELECT doc_id, 'bulk' AS mix_source, e AS epoch
FROM documents,
     UNNEST(generate_series(0,
         CASE WHEN substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 2)
                   < '40' THEN 1 ELSE 0 END - 1)) AS t(e)
WHERE source NOT IN ('src0', 'src1', 'src2', 'src3')
""",
)
def dataset_mixture_epochs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining mixture with epoch upsampling: the high-quality pair of
    sources runs ~2.3 epochs (2 whole copies + a ~30% hash-gated third),
    the mid tier exactly once, and the bulk tail thins to ~25% — the
    standard quality-weighted mixture, deterministic (no RNG) and
    described entirely by (whole_epochs, hex) pairs. The oracle replays
    the same md5 gates + generate_series fan-out relationally (DuckDB's
    generate_series(0,-1) is empty, matching the engine's pre-explode
    filter). operators.corpus.dataset_mixture_epochs: map-only bounded
    explode per source, no shuffle."""
    from ..operators.corpus import dataset_mixture_epochs

    d = _t(spark, sf_dir, "documents")
    hiq = d.filter(F.col("source").isin("src0", "src1"))
    mid = d.filter(F.col("source").isin("src2", "src3"))
    bulk = d.filter(~F.col("source").isin("src0", "src1", "src2", "src3"))
    mixed = dataset_mixture_epochs(
        {
            "hiq": (hiq, 2, "4d"),
            "mid": (mid, 1, "00"),
            "bulk": (bulk, 0, "40"),
        },
        key_col="doc_id",
    )
    return mixed.select("doc_id", "mix_source", F.col("epoch").cast("long"))


@query(
    "sample_quality_weighted",
    oracle="""
WITH scored AS (
    SELECT doc_id, lang,
           round(least(n_chars / 300.0, 1.0), 4) AS quality_w
    FROM documents
)
SELECT doc_id, lang, quality_w FROM scored
WHERE quality_w >= 1
   OR (quality_w > 0 AND
       substr(md5('qw' || CAST(doc_id AS VARCHAR)), 1, 2)
           < printf('%02x', CAST(floor(least(quality_w, 1.0) * 256)
                                 AS BIGINT)))
""",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted subsampling: each document's keep probability is
    its quality weight (here a length-derived score rounded to 4dp —
    swap in the oracled Gopher/stopword features in production), gated
    deterministically on an md5 prefix so the SAME rows survive on any
    engine and any partitioning. The oracle rebuilds the weight, the
    2-hex threshold, and the gate identically.
    operators.corpus.quality_weighted_sample: map-only filter."""
    from ..operators.corpus import quality_weighted_sample

    d = _t(spark, sf_dir, "documents").withColumn(
        "quality_w",
        F.round(F.least(F.col("n_chars") / 300.0, F.lit(1.0)), 4),
    )
    return quality_weighted_sample(
        d, key_col="doc_id", weight_col="quality_w"
    ).select("doc_id", "lang", "quality_w")
