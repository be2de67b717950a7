"""Property-based tests (hypothesis) for the reference-fidelity scalar
expressions — SURVEY.md §5.4.

Strategy: each hypothesis example is a BATCH of generated inputs run
through one Spark job, compared element-wise against an independent
Python transcription of the reference semantics
(video_metadata_db.py:69-106 hms, :190-196 sizeof, :1075-1103 parse).
Batching keeps job count ≈ max_examples instead of examples × values.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from video_metadata_db_spark.functions.scalar import (
    duration_hms,
    parse_release_year,
    parse_title,
    sizeof_fmt,
)

from .test_scalar_golden import model_hms, model_sizeof

# derandomize: examples are generated deterministically so a scheduled
# run can't go red on a never-before-seen input.  Soak runs during
# development (randomized, repeated) already surfaced the real
# divergences (sub-second ties, Unicode whitespace) — both now pinned.
SETTINGS = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def model_parse(stem: str) -> tuple[str, str]:
    """Direct transcription of ``parse_file_name_from_path``
    (:1075-1103), minus the basename step (stems are already names)."""
    title = stem
    for ident in ("[4K]", "[AV1]", "[3D]"):
        title = "".join(title.split(ident))
    release_year = title.partition("[")[2]
    if release_year:
        release_year = release_year.partition("]")[0]
        title = title.partition("]")[2]
    return title.strip(), release_year


# 3-decimal granularity: probes every carry boundary (x.5 rounding,
# minute/hour rollover, the <1s two-decimal rule) without generating
# doubles whose repr differs between the JVM and CPython.  Sub-second
# x.xx5 values are excluded: CPython rounds the binary double (0.175 →
# 0.17) while the JVM rounds its shortest decimal repr (0.175 → 0.18) —
# a documented divergence, pinned in test_hms_subsecond_tie_divergence.
_seconds = st.integers(min_value=0, max_value=200_000_000).filter(
    lambda ms: not (ms < 1000 and ms % 10 == 5)
).map(lambda ms: ms / 1000.0)


@SETTINGS
@given(st.lists(_seconds, min_size=30, max_size=30))
def test_hms_matches_reference_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s double")
    got = [r[0] for r in df.select(duration_hms("s", concise=True)).collect()]
    assert got == [model_hms(v, concise=True) for v in values]


# raw_size is BIGINT — int64 max ≈ 8 EiB exercises every unit through Ei
_sizes = st.integers(min_value=0, max_value=2**63 - 1)


@SETTINGS
@given(st.lists(_sizes, min_size=30, max_size=30))
def test_sizeof_matches_reference_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "n long")
    got = [r[0] for r in df.select(sizeof_fmt("n")).collect()]
    assert got == [model_sizeof(v) for v in values]


# filename-ish stems: brackets, digits, spaces, identifiers, unicode —
# biased toward the convention but free to produce malformed names,
# which is where the reference's partition-based parse gets quirky.
_fragment = st.one_of(
    st.sampled_from(["[4K]", "[AV1]", "[3D]", "[", "]", " ", "Avatar", "千尋", "x"]),
    st.from_regex(r"\[[0-9]{4}\]", fullmatch=True),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
        min_size=1,
        max_size=6,
    ),
)
_stems = st.lists(_fragment, min_size=0, max_size=8).map(" ".join)


@SETTINGS
@given(st.lists(_stems, min_size=25, max_size=25))
def test_title_year_parse_matches_reference_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "stem string")
    got = df.select(
        parse_title("stem").alias("t"), parse_release_year("stem").alias("y")
    ).collect()
    expect = [model_parse(v) for v in values]
    assert [(r["t"], r["y"]) for r in got] == expect


@SETTINGS
@given(st.lists(_seconds, min_size=30, max_size=30))
def test_hms_verbose_matches_reference_model(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "s double")
    got = [r[0] for r in df.select(duration_hms("s", concise=False)).collect()]
    assert got == [model_hms(v, concise=False) for v in values]


def test_hms_subsecond_tie_divergence(spark):
    """Pin the one documented divergence from CPython semantics: on
    sub-second x.xx5 doubles whose binary value sits below the decimal
    tie, CPython's round() sees no tie (0.175 → 0.17) while the engine
    rounds the shortest decimal repr half-even (0.175 → 0.18).  The
    engine side is deterministic and matched by the DuckDB oracle."""
    df = spark.createDataFrame([(0.175,), (0.375,)], "s double")
    got = [r[0] for r in df.select(duration_hms("s", concise=True)).collect()]
    assert got == ["0.18s", "0.38s"]  # engine: decimal-repr half-even
    assert model_hms(0.175, concise=True) == "0.17s"  # CPython: binary value
    assert model_hms(0.375, concise=True) == "0.38s"  # exact tie: both agree


# --- TSV boundary round trip --------------------------------------------

_codec = st.sampled_from([
    "H.264 / AVC", "H.265 / HEVC (High Efficiency Video Coding)",
    "Alliance for Open Media AV1", "MPEG-4 part 2", None,
])
_title = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc"), blacklist_characters="\t\r\n"),
        min_size=1, max_size=20,
    ).filter(lambda t: t.strip() == t and t != "<Title Not Set>"),
)
_record = st.tuples(
    st.one_of(st.none(), st.integers(1, 9999)),       # width (4-char pad limit)
    st.one_of(st.none(), st.integers(1, 9999)),       # height
    st.one_of(st.none(), st.floats(0, 1e5, allow_nan=False)),  # duration_s
    st.integers(0, 2**40),                            # raw_size
    _codec,                                           # video_codec
    st.integers(1, 12),                               # n_streams
    st.sampled_from(["Matroska / WebM", "QuickTime / MOV", None]),  # container
    st.one_of(st.none(), st.integers(1, 8)),          # audio_channels
    st.sampled_from(["AAC", "AC-3", None]),           # audio_codec
    _title,                                           # title
    st.booleans(),                                    # sub_en
    st.booleans(),                                    # sub_en_hi
)


@SETTINGS
@given(st.lists(_record, min_size=15, max_size=15))
def test_tsv_boundary_roundtrip(spark, tmp_path_factory, records):
    """write(to_boundary) → read → from_boundary recovers every
    recoverable typed column exactly (duration is documented-lossy),
    including NULL/sentinel/padding quirks, for arbitrary records."""
    from video_metadata_db_spark.schemas import METADATA_SCHEMA
    from video_metadata_db_spark.sources.tsv import (
        from_boundary,
        read_metadata_tsv,
        write_metadata_tsv,
    )

    rows = []
    for i, (w, h, dur, sz, vc, ns, ct, ach, ac, ti, se, sh) in enumerate(records):
        rows.append(
            (w, h, dur, sz, vc, ns, ct, ach, ac, ti,
             se, 100 + i if se else None, sh, 200 + i if sh else None,
             "/vol", f"/media/f{i}.mkv")
        )
    df = spark.createDataFrame(rows, METADATA_SCHEMA)
    out = str(tmp_path_factory.mktemp("tsvprop") / "db.tsv")
    write_metadata_tsv(df, out, header=True)
    back = from_boundary(read_metadata_tsv(spark, out, header=True))

    keep = [f.name for f in METADATA_SCHEMA.fields if f.name != "duration_s"]
    orig = df.select(*keep).orderBy("path").collect()
    got = back.select(*keep).orderBy("path").collect()
    assert got == orig


# --- shingle construction (the dedup primitive) --------------------------

def model_shingles(text: str, k: int = 3) -> list[str]:
    toks = [t for t in text.split(" ") if t != ""]
    if len(toks) < k:
        return []
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return list(dict.fromkeys(grams))  # distinct, first-occurrence order


_texts = st.lists(
    st.one_of(
        st.sampled_from(["the", "a", "spark", "query", "join", ""]),
        st.text(alphabet="abcxyz ", min_size=0, max_size=5),
    ),
    min_size=0,
    max_size=12,
).map(" ".join)


@SETTINGS
@given(st.lists(_texts, min_size=20, max_size=20), st.sampled_from([2, 3, 5]))
def test_shingles_match_model(spark, texts, k):
    """`shingles_of` (iterated zip_with) == the direct Python model for
    every k: same grams, same distinctness, same first-occurrence order
    — including texts shorter than k (empty, no phantom shingles)."""
    from video_metadata_db_spark.operators.dedup import shingles_of

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r[0] for r in df.select(shingles_of(F.col("text"), k)).collect()]
    assert got == [model_shingles(t, k) for t in texts]


@SETTINGS
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 10**6)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    st.sampled_from([1, 3, 8, 50]),
)
def test_global_row_number_matches_sorted_model(spark, rows, num_ranges):
    """Distributed rank == Python sorted() rank for arbitrary
    (colliding-key, unique-tiebreak) inputs across bucket widths,
    including more buckets than rows."""
    from video_metadata_db_spark.operators.packing import global_row_number

    df = spark.createDataFrame(rows, "k long, id long")
    got = {
        r["id"]: r["position"]
        for r in global_row_number(df, "k", "id", num_ranges=num_ranges).collect()
    }
    expect = {t[1]: i for i, t in enumerate(sorted(rows))}
    assert got == expect


@SETTINGS
@given(st.lists(_texts, min_size=8, max_size=8))
def test_sliding_chunks_match_model(spark, texts):
    """The chunk generator (explode(sequence) + slice, window 4 stride
    2 here) == the direct Python model: chunk starts tile [0, n) by the
    stride, every chunk carries min(size, n-start) tokens, and token
    content round-trips exactly."""
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    from video_metadata_db_spark.operators.dedup import tokens_of

    toked = df.select("doc_id", tokens_of(F.col("text")).alias("toks")).filter(
        F.size("toks") > 0
    )
    out = toked.select(
        "doc_id",
        F.size("toks").alias("n"),
        F.explode(F.sequence(F.lit(0), F.size("toks") - 1, F.lit(2))).alias("start"),
        "toks",
    ).select(
        "doc_id",
        "start",
        F.least(F.lit(4), F.col("n") - F.col("start")).alias("chunk_len"),
        F.slice("toks", F.col("start") + 1, 4).alias("chunk"),
    )
    got = {
        (r["doc_id"], r["start"]): (r["chunk_len"], tuple(r["chunk"]))
        for r in out.collect()
    }
    expect = {}
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        for start in range(0, len(toks), 2):
            expect[(doc_id, start)] = (
                min(4, len(toks) - start),
                tuple(toks[start : start + 4]),
            )
    assert got == expect


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 16) - 1),
            st.integers(min_value=0, max_value=(1 << 16) - 1),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@SETTINGS
def test_zorder_interleave_roundtrip(spark, rank_pairs):
    """Morton interleave is a bijection: de-interleaving the z-value
    recovers both ranks exactly, and z-order locality holds (equal
    high-rank-bits ⇒ nearby z)."""
    from video_metadata_db_spark.sources.maintenance import ZORDER_BITS, zorder_value
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rank_pairs, "r0 int, r1 int")
    out = df.select(
        "r0", "r1", zorder_value([F.col("r0"), F.col("r1")]).alias("z")
    ).collect()
    for row in out:
        d0 = sum(((row["z"] >> (2 * b)) & 1) << b for b in range(ZORDER_BITS))
        d1 = sum(((row["z"] >> (2 * b + 1)) & 1) << b for b in range(ZORDER_BITS))
        assert (d0, d1) == (row["r0"], row["r1"])


@given(
    st.lists(
        st.tuples(*([st.integers(min_value=0, max_value=(1 << 15) - 1)] * 4)),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
@SETTINGS
def test_zorder_four_columns_stays_positive_and_bijective(spark, rank_tuples):
    """ADVICE r4: with 4 columns the full 16-bit interleave would push
    the top bit into the long's SIGN bit (position 63), silently
    breaking the Morton order for high ranks.  zorder_bits shrinks
    per-column resolution (63 // n = 15 bits) — z stays non-negative
    and the interleave stays a bijection at the reduced width."""
    from pyspark.sql import functions as F

    from video_metadata_db_spark.sources.maintenance import zorder_bits, zorder_value

    bits = zorder_bits(4)
    assert bits * 4 <= 63
    df = spark.createDataFrame(rank_tuples, "r0 int, r1 int, r2 int, r3 int")
    out = df.select(
        "r0", "r1", "r2", "r3",
        zorder_value([F.col(c) for c in ("r0", "r1", "r2", "r3")]).alias("z"),
    ).collect()
    for row in out:
        assert row["z"] >= 0, row
        got = tuple(
            sum(((row["z"] >> (4 * b + i)) & 1) << b for b in range(bits))
            for i in range(4)
        )
        assert got == (row["r0"], row["r1"], row["r2"], row["r3"])


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "bb", "ccc", "dd", "e", "ffff", "gg", "hhh"]),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
@SETTINGS
def test_chunking_partitions_every_document(spark, token_lists):
    """Property: content-defined chunking is a PARTITION of the token
    stream — chunk texts joined in order reconstruct the document
    exactly, n_tokens sums to the token count, chunk indexes are dense
    from 0, and empty documents emit nothing."""
    from video_metadata_db_spark.operators.chunking import content_defined_chunks

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    rows = content_defined_chunks(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(token_lists):
        got = sorted(by_doc.get(i, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert got == []
            continue
        assert [r["chunk_idx"] for r in got] == list(range(len(got)))
        assert sum(r["n_tokens"] for r in got) == len(toks)
        assert " ".join(r["chunk_text"] for r in got) == " ".join(toks)
        assert all(r["n_tokens"] >= 1 for r in got)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),                       # key
            st.one_of(st.none(), st.text("abc", max_size=3)),  # t
            st.one_of(st.none(), st.integers(0, 5)),  # x
        ),
        max_size=12,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.text("abc", max_size=3)),
            st.one_of(st.none(), st.integers(0, 5)),
        ),
        max_size=12,
    ),
)
@SETTINGS
def test_corpus_diff_patch_roundtrip(spark, old_rows, new_rows):
    """Property: apply_diff(old, corpus_diff_patch(old, new)) == new
    for ANY pair of releases (duplicate keys dropped to keep releases
    well-formed; null payloads included)."""
    from video_metadata_db_spark.operators.diff import (
        apply_diff,
        corpus_diff_patch,
    )

    def frame(rows):
        dedup = list({r[0]: r for r in rows}.values())
        return spark.createDataFrame(
            dedup or [(-(10 ** 9), None, None)], "k long, t string, x long"
        )

    old, new = frame(old_rows), frame(new_rows)
    patch = corpus_diff_patch(old, new, ["k"])
    rebuilt = apply_diff(old, patch, ["k"])
    want = {tuple(r) for r in new.collect()}
    got = {tuple(r) for r in rebuilt.collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(10 ** 20, 10 ** 30),  # n  (or any exact sum)
            st.integers(10 ** 20, 10 ** 30),  # sxy
            st.integers(10 ** 20, 10 ** 30),  # sx
            st.integers(10 ** 20, 10 ** 30),  # sy
        ),
        min_size=1,
        max_size=24,
    ),
)
@SETTINGS
def test_comoment_double_combination_survives_overflow_regime(spark, sums):
    """Property: the r7 co-moment discipline — exact DECIMAL(38,0)
    sums cast to DOUBLE BEFORE the ``n·Σxy − Σx·Σy`` products — yields
    the IEEE value Python computes from the same integers, at
    magnitudes where the pre-r7 decimal-product form provably
    overflowed (every product here needs ≥ 40 digits, past the
    38-digit width Spark's non-ANSI decimal arithmetic silently NULLs).

    Guards the fix for the scale-dependent divergence VERDICT r6
    flagged in discount_quantity_corr / degree_assortativity /
    text_zipf_fit (and siblings): the old expression fails in this
    regime (raises under ANSI — the Spark 4 default — or silently
    NULLs under legacy decimal arithmetic), the new one stays finite
    and exact-to-the-ulp."""
    import math

    from decimal import Decimal

    df = spark.createDataFrame(
        [tuple(Decimal(v) for v in row) for row in sums],
        "n decimal(38,0), sxy decimal(38,0), sx decimal(38,0), sy decimal(38,0)",
    )
    rows = df.select(
        F.expr("CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy").alias("new")
    ).collect()
    for (n, sxy, sx, sy), row in zip(sums, rows):
        want = float(n) * float(sxy) - float(sx) * float(sy)
        assert row["new"] is not None and math.isfinite(row["new"])
        assert row["new"] == want
    # the pre-fix decimal-product form is WRONG here either way:
    # NUMERIC_VALUE_OUT_OF_RANGE under ANSI, all-NULL under legacy
    try:
        old = df.select(
            F.expr("CAST(n * sxy - sx * sy AS DOUBLE)").alias("old")
        ).collect()
    except Exception:
        pass  # ANSI: overflow raises — the loud failure mode
    else:
        assert all(r["old"] is None for r in old)
