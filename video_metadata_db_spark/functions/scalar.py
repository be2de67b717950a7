"""Parity scalar functions — pure Catalyst column expressions, no UDFs.

Each function re-expresses one derived-column computation of the
reference as a composition of built-in ``pyspark.sql.functions`` so it
stays inside whole-stage codegen (SURVEY.md §2.2).  Reference behaviors
are cited by ``video_metadata_db.py:<line>`` ranges; quirks (banker's
rounding, the minutes-carry rounding, identifier stripping order) are
deliberately preserved because they are the spec.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- constants (spec'd by the reference) ---------------------------------

#: Codecs already compressed → NOT candidates (video_metadata_db.py:296-304).
COMPRESSED_CODECS = (
    "Alliance for Open Media AV1",
    "H.265 / HEVC (High Efficiency Video Coding)",
)

#: Directory names pruned during the scan (video_metadata_db.py:993-1004).
DIRECTORY_FILTERS = (
    "Deleted Scenes",
    "@eaDir",
    "External AC3",
    "Extras",
    "Featurettes",
    "Interviews",
    "Select Soundbites",
    "Soundtrack",
    "Storyboards",
    "Trailers",
)

#: Extension whitelist, lower-case (video_metadata_db.py:1026-1045).
VIDEO_EXTENSIONS = (
    "av1", "avi", "divx", "mp4", "mkv", "m4v", "mpg", "mpeg", "mov",
    "rm", "vob", "wmv", "flv", "3gp", "rmvb", "webm", "dat", "mts",
)

#: Filename identifiers stripped before title/year parsing
#: (video_metadata_db.py:1086), in this order.
TITLE_IDENTIFIERS = ("[4K]", "[AV1]", "[3D]")

#: Sentinel emitted at the TSV boundary for a missing title
#: (video_metadata_db.py:345-347).
TITLE_NOT_SET = "<Title Not Set>"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- duration formatting (video_metadata_db.py:69-110) -------------------

def duration_hms(seconds_raw: Column | str, concise: bool = True) -> Column:
    """seconds (double) → ``"1h:2m:3s"`` / ``"1 hour(s) 2 minute(s) 3 second(s)"``.

    Pins the reference's exact arithmetic (video_metadata_db.py:69-101):

    - every rounding is Python ``round`` = half-to-even → ``F.bround``;
    - the minute/hour carry uses ``round(x/60)`` not ``floor`` (so 90 s
      renders as ``2m:30s`` — quirk preserved, it is the spec);
    - 0 < raw < 1 → seconds shown with 2 decimals;
    - 1 < raw < 60 → nearest integer (both only when hours*minutes == 0);
    - zero components are omitted entirely (``"90s"`` never happens, but
      ``"1h:30s"`` does when minutes == 0).

    NULL in → NULL out (the ``"N/A"`` guard at :271-277 lives at the TSV
    boundary, not here).

    Documented divergence (tests/test_properties.py): on sub-second
    ``x.xx5`` doubles whose binary value sits just below the decimal tie
    (e.g. 0.175), CPython's ``round`` yields 0.17 while the JVM (and
    DuckDB) round the shortest decimal repr half-even to 0.18.  Exact
    binary ties (0.375) agree on both.  Property-tested everywhere else.
    """
    raw = _col(seconds_raw).cast("double")
    secs0 = F.bround(raw).cast("long")
    # minute carry: round(seconds / 60) — half-to-even, NOT floor (:73-75)
    minutes0 = F.when(secs0 >= 60, F.bround(secs0 / F.lit(60.0)).cast("long")).otherwise(F.lit(0))
    secs1 = F.when(secs0 >= 60, secs0 % 60).otherwise(secs0)
    hours = F.when(minutes0 >= 60, F.bround(minutes0 / F.lit(60.0)).cast("long")).otherwise(F.lit(0))
    minutes = F.when(minutes0 >= 60, minutes0 % 60).otherwise(minutes0)

    # "a fractional report matters only when it's less than 1" (:81-89)
    no_hm = (hours == 0) | (minutes == 0)
    sub_second = no_hm & (raw < 1) & (raw > 0)
    sub_minute = no_hm & (raw < 60) & (raw > 1)
    secs_str = (
        F.when(sub_second, F.bround(raw, 2).cast("string"))
        .when(sub_minute, F.bround(raw).cast("long").cast("string"))
        .otherwise(secs1.cast("string"))
    )

    if concise:
        h_part = F.when(hours > 0, F.concat(hours.cast("string"), F.lit("h:"))).otherwise(F.lit(""))
        m_part = F.when(minutes > 0, F.concat(minutes.cast("string"), F.lit("m:"))).otherwise(F.lit(""))
        s_part = F.concat(secs_str, F.lit("s"))
    else:
        h_part = F.when(hours > 0, F.concat(hours.cast("string"), F.lit(" hour(s) "))).otherwise(F.lit(""))
        m_part = F.when(minutes > 0, F.concat(minutes.cast("string"), F.lit(" minute(s) "))).otherwise(F.lit(""))
        s_part = F.concat(secs_str, F.lit(" second(s)"))
    return F.concat(h_part, m_part, s_part)


# --- human-readable sizes (video_metadata_db.py:190-196) -----------------

_SIZE_UNITS = ("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi")


def sizeof_fmt(num: Column | str, suffix: str = "B") -> Column:
    """bytes → IEC human size, ``'%3.1f%s%s'`` formatting per the reference.

    The reference's divide-by-1024 loop becomes a ``when`` chain over the
    same unit table — still one codegen'd expression, no UDF.
    """
    n = _col(num).cast("double")
    expr = F.format_string(f"%.1f%s{suffix}", n / F.lit(1024.0 ** len(_SIZE_UNITS)), F.lit("Yi"))
    # build the chain from largest unit down so the first match wins on read order
    for i in reversed(range(len(_SIZE_UNITS))):
        scaled = n / F.lit(1024.0**i)
        expr = F.when(
            F.abs(scaled) < 1024.0,
            F.format_string(f"%3.1f%s{suffix}", scaled, F.lit(_SIZE_UNITS[i])),
        ).otherwise(expr)
    return expr


# --- flags & derived paths ----------------------------------------------

def compression_candidate(video_codec: Column | str) -> Column:
    """``'N'`` if the codec is already AV1/HEVC else ``'Y'`` (:296-304)."""
    return F.when(_col(video_codec).isin(*COMPRESSED_CODECS), F.lit("N")).otherwise(F.lit("Y"))


def sidecar_path(path: Column | str, kind: str = "en") -> Column:
    """Video path → external-subtitle sidecar path (:355-358).

    ``kind='en'`` → ``<stem>.en.srt``; ``kind='en.hi'`` → ``<stem>.en.hi.srt``.
    """
    stem = F.regexp_replace(_col(path), r"\.[^./\\]+$", "")
    return F.concat(stem, F.lit(f".{kind}.srt"))


def strip_drive_letter(path: Column | str) -> Column:
    """Drop a Windows drive prefix, parity with ``os.path.splitdrive`` (:396-397)."""
    return F.regexp_replace(_col(path), r"^[A-Za-z]:", "")


def extension_of(name: Column | str) -> Column:
    """Filename → lower-cased extension after the last dot (:1017-1023).

    A name with no dot yields ``''`` (mirrors ``rpartition`` returning the
    whole name only when a separator exists — splitext gives ``''`` first).
    """
    return F.lower(F.regexp_extract(_col(name), r"\.([^.]*)$", 1))


def is_video_file(name: Column | str) -> Column:
    """Extension-whitelist predicate (:1026-1045), case-insensitive."""
    return extension_of(name).isin(*VIDEO_EXTENSIONS)


def in_filtered_directory(path: Column | str) -> Column:
    """True iff any path component matches the directory filter set (:993-1014).

    The reference prunes during ``os.walk``; on a listing DataFrame the
    same semantics is "any ancestor directory named one of the filters".
    At scale, prefer pruning in the lister itself (cheaper than listing
    then filtering) — this predicate covers pre-listed inputs.
    """
    parts = F.split(_col(path), r"[/\\]")
    filters = F.array(*[F.lit(f) for f in DIRECTORY_FILTERS])
    return F.arrays_overlap(parts, filters)


# --- filename → (title, release_year) (video_metadata_db.py:1075-1103) ---

def _strip_identifiers(name: Column) -> Column:
    out = name
    for ident in TITLE_IDENTIFIERS:
        out = F.replace(out, F.lit(ident), F.lit(""))
    return out


def parse_title(basename: Column | str) -> Column:
    """``"[2009] Avatar [3D][4K]"`` → ``"Avatar"``.

    Faithful to the reference's partition-based parse (:1075-1103):
    identifiers ``[4K] [AV1] [3D]`` removed everywhere first; if text
    follows the first ``[``, the title is whatever follows the first
    ``]`` (empty when there is no ``]``), finally ``strip()``-ed.
    Input is the basename *without* extension (caller strips it).
    """
    t = _strip_identifiers(_col(basename))
    # "year present" == some text follows the first '[' (:1092-1094)
    has_year = (F.instr(t, "[") > 0) & (F.instr(t, "[") < F.length(t))
    pos_rb = F.instr(t, "]")
    title_tail = F.when(pos_rb > 0, t.substr(pos_rb + F.lit(1), F.length(t))).otherwise(F.lit(""))
    # CPython str.strip() removes ALL Unicode whitespace (NBSP, ideographic
    # space, …); SQL trim() is ASCII-space-only — strip exactly CPython's
    # set: the Unicode White_Space property plus \x1c-\x1f (property-tested)
    return F.regexp_replace(
        F.when(has_year, title_tail).otherwise(t),
        r"^[\p{IsWhite_Space}\x1c-\x1f]+|[\p{IsWhite_Space}\x1c-\x1f]+$",
        "",
    )


def parse_release_year(basename: Column | str) -> Column:
    """``"[2009] Avatar"`` → ``"2009"`` (string, not trimmed — parity).

    Everything after the first ``[`` up to the first following ``]``;
    no ``]`` → the whole remainder; no ``[`` (or ``[`` last) → ``''``.
    """
    t = _strip_identifiers(_col(basename))
    pos_lb = F.instr(t, "[")
    tail = F.when(pos_lb > 0, t.substr(pos_lb + F.lit(1), F.length(t))).otherwise(F.lit(""))
    return F.substring_index(tail, "]", 1)
