"""Skew-mitigation and grouped-map-UDF queries, both value-oracled.

``join_salted_skew`` proves the salt is semantically invisible: the
oracle is the PLAIN join, so any salt leakage (lost rows, dup rows)
hash-mismatches.  ``udf_grouped_zscore`` pins the Arrow grouped-map
path (applyInPandas) against a window-function oracle — the transform
is deliberately also SQL-expressible so it can be value-checked; the
operator exists for the transforms that aren't.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_join
from ..sources.tables import load_table
from .registry import query


@query(
    "join_salted_skew",
    oracle="""
SELECT s.s_name,
       count(*) AS n_items,
       CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l.l_discount AS DECIMAL(18,2))), 2)
            AS DOUBLE) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY s.s_name
""",
)
def q_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue through a SALTED join (8 salts on the fact
    side, replicated dim).  The oracle is the unsalted join — identical
    values prove salting only reshapes the shuffle, never the result."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("suppkey"), "l_extendedprice", "l_discount"
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("suppkey"), "s_name"
    )
    joined = salted_join(lineitem, supplier, key="suppkey", n_salts=8)
    return (
        joined.groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # decimal sum: exact and order-independent, so the salted
            # shuffle's different reduce order can't shift the rounding;
            # final cast to double so the output schema is driver-hashable
            # (raw decimals canonicalize differently across engines)
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (1 - F.col("l_discount")).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("s_name")
    )


_ZSCORE_SCHEMA = "event_id long, event_type string, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)  # sample stddev = stddev_samp = DuckDB stddev
    z = (pdf["value"] - mu) / sd if sd and sd > 0 else pdf["value"] * 0.0
    return pd.DataFrame(
        {"event_id": pdf["event_id"], "event_type": pdf["event_type"], "zscore": z.round(6)}
    )


@query(
    "udf_grouped_zscore",
    oracle="""
SELECT event_id, event_type,
       round((value - avg(value) OVER (PARTITION BY event_type))
             / stddev(value) OVER (PARTITION BY event_type), 6) AS zscore
FROM events
ORDER BY event_id
""",
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-scores via applyInPandas (Arrow grouped map,
    one pandas frame per group).  Natively expressible with window
    functions (the oracle does exactly that) — registered to pin the
    grouped-map UDF surface with a full value oracle.  At scale:
    one shuffle on the group key; group size must fit a worker's
    memory, else fall back to the window-function form."""
    events = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return (
        events.groupBy("event_type")
        .applyInPandas(_zscore_group, _ZSCORE_SCHEMA)
        .orderBy("event_id")
    )


def _histogram_bins_sql() -> str:
    """DuckDB list-of-16-doubles replicating ``fake_decode`` over the
    synthesized 64-byte payload: byte i = hex pair 2i-1..2i of
    repeat(md5(text), 4)."""
    byte_vals = (
        "[CAST(concat('0x', substr(repeat(md5(text), 4), 2*i - 1, 2)) AS INT) % 16 "
        "FOR i IN range(1, 65)]"
    )
    bins = ", ".join(
        f"len(list_filter(bv, x -> x = {b})) / 64.0" for b in range(16)
    )
    return f"SELECT doc_id, {byte_vals} AS bv FROM documents", f"[{bins}]"


_BV_CTE, _BINS_LIST = _histogram_bins_sql()


@query(
    "multimodal_features",
    oracle=f"""
WITH bv AS ({_BV_CTE})
SELECT doc_id AS asset_id,
       ['image', 'audio', 'video'][(doc_id % 3) + 1] AS kind,
       CAST(64 AS BIGINT) AS n_bytes,
       array_to_string(list_transform({_BINS_LIST}, x -> printf('%.6f', x)), ',')
           AS feature_csv
FROM bv
ORDER BY asset_id
""",
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline end-to-end: binary assets (md5-derived
    payloads — the CI stand-in for a media lake) → Arrow-batched
    mapInPandas feature extraction (16-bin byte histogram standing in
    for decode+embed).  The feature math is deliberately hex-arithmetic-
    reproducible so even the Pandas-UDF path gets a FULL value oracle;
    bins are counts/64 (power of two), exact in binary on both engines.
    Reference analogue: the ffprobe stage (video_metadata_db.py:517-725)
    generalized to arbitrary media features."""
    from ..operators.multimodal import extract_features, synthesize_assets

    docs = load_table(spark, sf_dir, "documents")
    feats = extract_features(synthesize_assets(docs))
    # the array<double> feature is serialized to a fixed-format CSV string
    # at the query boundary: raw array columns are not hashable by the
    # driver's pandas canonicalizer (the round-3 failure class)
    return (
        feats.filter(F.col("error").isNull())
        .select(
            "asset_id",
            "kind",
            "n_bytes",
            F.array_join(
                F.transform("feature", lambda x: F.format_string("%.6f", x)), ","
            ).alias("feature_csv"),
        )
        .orderBy("asset_id")
    )


@query(
    "multimodal_frames",
    oracle="""
SELECT doc_id AS asset_id,
       i AS frame_idx,
       i / 4.0 AS ts_frac,
       CAST(16 AS BIGINT) AS n_bytes,
       upper(substr(repeat(md5(text), 4), i * 32 + 1, 32)) AS frame_hex
FROM documents, (SELECT unnest([0, 1, 2, 3]) AS i)
WHERE doc_id % 3 = 2
ORDER BY asset_id, frame_idx
""",
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: 1 binary row → N frame rows via
    ``mapInPandas`` (executor-side explode inside Arrow batches; the
    driver never sees frame bytes).  The deterministic fake slices the
    64-byte payload into 4 "frames", so each frame is a hex substring of
    ``repeat(md5(text), 4)`` — a FULL value oracle for the 1→N Pandas
    UDF path.  Reference analogue: the commented-out all-streams probe
    (video_metadata_db.py:728-757), one file → N streams."""
    from ..operators.multimodal import sample_frames, synthesize_assets

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(synthesize_assets(docs), n_frames=4)
    return frames.select(
        "asset_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        "ts_frac",
        "n_bytes",
        F.hex("frame").alias("frame_hex"),
    ).orderBy("asset_id", "frame_idx")


@query(
    "multimodal_audio_windows",
    oracle="""
WITH bytes AS (
  SELECT doc_id, CAST((i - 1) // 16 AS INT) AS w,
         CAST(concat('0x', substr(repeat(md5(text), 4), 2*i - 1, 2)) AS INT) AS b
  FROM documents, (SELECT unnest(range(1, 65)) AS i)
  WHERE doc_id % 3 = 1
),
win AS (
  SELECT doc_id, w,
         SUM(b) / 16.0 AS level,
         sqrt(SUM(b * b) / 16.0) AS rms,
         MAX(b) AS peak
  FROM bytes GROUP BY doc_id, w
)
SELECT w AS window_idx,
       CAST(count(*) AS BIGINT) AS n_assets,
       CAST(round(AVG(level), 6) AS DOUBLE) AS avg_level,
       CAST(round(AVG(rms), 6) AS DOUBLE) AS avg_rms,
       CAST(MAX(peak) AS INT) AS max_peak
FROM win GROUP BY w ORDER BY window_idx
""",
)
def q_multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-path multimodal pipeline: binary payloads cut into fixed
    PCM-style windows with per-window level/RMS/peak via Arrow-batched
    ``mapInPandas`` (``operators/multimodal.audio_windows``), rolled up
    per window position across the audio assets — the loudness-profile
    shape a speech/VAD featurizer emits, on the deterministic fake
    stream.  Window size is a power of two, so level and mean-square
    are EXACT dyadic doubles and rms is one IEEE sqrt — the Pandas-UDF
    path gets a FULL value oracle replaying the hex arithmetic in SQL.
    Completes the modality triple beside `multimodal_features` (image
    histogram) and `multimodal_frames` (video frame sampling)."""
    from ..operators.multimodal import audio_windows, synthesize_assets

    docs = load_table(spark, sf_dir, "documents")
    assets = synthesize_assets(docs).filter(F.col("kind") == "audio")
    win = audio_windows(assets)
    return (
        win.groupBy("window_idx")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.round(F.avg("level"), 6).alias("avg_level"),
            F.round(F.avg("rms"), 6).alias("avg_rms"),
            F.max("peak").alias("max_peak"),
        )
        .orderBy("window_idx")
    )


@query(
    "udtf_positional_tokens",
    oracle="""
SELECT doc_id, t.token, t.pos
FROM (
  SELECT doc_id,
         -- filter empties BEFORE indexing: pos is the token's ordinal
         -- among non-empty tokens, matching the UDTF's counter (a raw
         -- split index would diverge on consecutive/leading spaces)
         unnest(list_transform(
           list_filter(string_split(text, ' '), x -> x <> ''),
           (x, i) -> struct_pack(token := x, pos := i - 1)
         )) AS t
  FROM documents
)
WHERE t.pos < 3
ORDER BY doc_id, t.pos
""",
)
def q_udtf_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Python UDTF surface (Spark 4 ``@udtf`` + LATERAL join)
    — one input row yields N output rows from an arbitrary Python
    generator, the escape hatch for row-expanding logic no built-in
    generator expresses (stateful parsers, external tokenizers).

    This instance (tokens with positions, first 3 per doc) IS
    expressible natively — registered precisely so the UDTF path gets
    a full value oracle, like ``udf_grouped_zscore`` does for grouped
    maps.  At scale a UDTF is a per-row Python round-trip: keep it off
    hot paths (the native `explode_tokens`/`chunk_sliding_tokens`
    queries are the codegen forms) and reach for it only when the
    expansion logic genuinely needs Python."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class PositionalTokens:
        def eval(self, text: str):
            pos = 0
            for w in (text or "").split(" "):
                if w:
                    if pos < 3:
                        yield w, pos
                    pos += 1

    spark.udtf.register("positional_tokens", PositionalTokens)
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM _udtf_docs d, LATERAL positional_tokens(d.text) t
        ORDER BY d.doc_id, t.pos
        """
    )


@query(
    "variant_json_path",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q_variant_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4
    ``parse_json`` → ``variant_get``) — the modern path for JSON
    columns: parse ONCE into the binary variant encoding, then typed
    path extraction, instead of per-access string re-parsing
    (`json_extract_props` pins that legacy form).

    At 100 TB the difference is real: variant shreds the parse cost to
    one pass and the extracted paths stay codegen-typed; with variant
    shredding in the writer the path reads skip even the parse.  The
    oracle reads the same paths with DuckDB's JSON functions."""
    events = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("k").cast("bigint")).alias("k_total"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


@query(
    "arrow_byte_stats",
    oracle="""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(MAX(strlen(text)) AS BIGINT) AS max_doc_bytes
FROM documents
GROUP BY source
ORDER BY source
""",
)
def q_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte/char accounting through ``mapInArrow`` — the
    LOWEST-overhead Python boundary Spark offers (raw Arrow
    RecordBatches, no pandas materialization): the per-row byte and
    character lengths are computed by Arrow C++ compute kernels
    (``binary_length``/``utf8_length``), then aggregated JVM-side.
    Complements the pandas_udf / grouped-map / UDTF coverage with the
    one UDF API the inventory lacked; storage accounting (bytes vs
    chars ratio ≈ UTF-8 multibyte share) is the natural fit because
    the kernel IS the operation — no per-row Python at any point.

    Scale: embarrassingly parallel map over Arrow batches (zero-copy
    from the columnar scan), then one partial-aggregatable rollup on
    the tiny (source) domain.  Exactness: byte and char counts are
    integers; the oracle's DuckDB twins are strlen (bytes) and length
    (chars)."""
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def lengths(batches):
        import pyarrow.compute as pc

        for rb in batches:
            text = rb.column(rb.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(rb.schema.get_field_index("source")),
                    pc.cast(pc.binary_length(text), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["source", "n_bytes", "n_chars"],
            )

    long = docs.mapInArrow(
        lengths, "source string, n_bytes long, n_chars long"
    )
    return (
        long.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_bytes").cast("long").alias("max_doc_bytes"),
        )
        .orderBy("source")
    )


@query(
    "multimodal_frame_dedup",
    oracle="""
WITH frames AS (
  SELECT doc_id AS asset_id,
         upper(substr(repeat(md5(text), 4), i * 32 + 1, 32)) AS fp
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS i)
  WHERE doc_id % 3 = 2
),
clusters AS (
  SELECT fp, count(DISTINCT asset_id) AS n_assets, count(*) AS n_frames
  FROM frames GROUP BY fp
)
SELECT CAST(n_assets AS BIGINT) AS n_assets_sharing,
       CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(sum(n_frames) AS BIGINT) AS n_frames
FROM clusters
GROUP BY n_assets
ORDER BY n_assets_sharing
""",
)
def q_multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-video FRAME dedup — the media-lake twin of
    `span_dedup_crossdoc`: fingerprint every sampled frame (content
    hex; a real pipeline would use a perceptual hash in the same
    slot) and histogram how many distinct videos share each
    fingerprint — the detector for re-uploads, intro/outro boilerplate
    and test patterns that inflate a video training corpus.  Composes
    the `sample_frames` mapInPandas stage (executor-side 1→N explode,
    driver never sees frame bytes) with a plain relational tail.

    Scale: fingerprints leave the Python boundary as fixed-width
    strings, so the tail is dedup_exact's shape — one combinable
    groupBy on the fingerprint + one tiny histogram aggregate; the
    heavy (decode) stage stays in Arrow batches and is
    embarrassingly parallel."""
    from ..operators.multimodal import sample_frames, synthesize_assets

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(synthesize_assets(docs), n_frames=4).select(
        "asset_id", F.hex("frame").alias("fp")
    )
    clusters = frames.groupBy("fp").agg(
        F.count_distinct("asset_id").alias("n_assets"),
        F.count(F.lit(1)).alias("n_frames"),
    )
    return (
        clusters.groupBy("n_assets")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fingerprints"),
            F.sum("n_frames").cast("long").alias("n_frames"),
        )
        .select(
            F.col("n_assets").cast("long").alias("n_assets_sharing"),
            "n_fingerprints",
            "n_frames",
        )
        .orderBy("n_assets_sharing")
    )
