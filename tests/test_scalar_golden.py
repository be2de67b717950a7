"""Golden tests pinning reference-fidelity scalar semantics (FIXTURES.md A.5).

Expected values come from an independent Python model of the documented
behavior (SURVEY.md §2.2): half-to-even rounding everywhere, the
round-not-floor minute/hour carry, the sub-second two-decimal rule, the
``%3.1f`` IEC size format, and the partition-based title/year parse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from video_metadata_db_spark.functions.scalar import (
    duration_hms,
    extension_of,
    is_video_file,
    parse_release_year,
    parse_title,
    sizeof_fmt,
)


# --- independent models of the documented semantics ----------------------

def model_hms(raw: float, concise: bool = True) -> str:
    seconds: float | int = round(raw)
    minutes = hours = 0
    if seconds >= 60:
        minutes = round(seconds / 60)
        seconds = seconds % 60
    if minutes >= 60:
        hours = round(minutes / 60)
        minutes = minutes % 60
    if (not (hours and minutes)) and 0 < raw < 1:
        seconds = round(raw, 2)
    elif (not (hours and minutes)) and 1 < raw < 60:
        seconds = round(raw)
    if concise:
        return (f"{hours}h:" if hours else "") + (f"{minutes}m:" if minutes else "") + f"{seconds}s"
    return (
        (f"{hours} hour(s) " if hours else "")
        + (f"{minutes} minute(s) " if minutes else "")
        + f"{seconds} second(s)"
    )


def model_sizeof(num: float, suffix: str = "B") -> str:
    for unit in ("", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi"):
        if abs(num) < 1024.0:
            return "%3.1f%s%s" % (num, unit, suffix)
        num /= 1024.0
    return "%.1f%s%s" % (num, "Yi", suffix)


HMS_CASES = [0.37, 0.375, 2.5, 42.6, 59.5, 59.4, 60.0, 61.0, 89.5, 90.0, 91.0,
             119.0, 3599.5, 3600.0, 3661.0, 5025.0, 7265.25, 86399.5, 1.0, 0.004]
SIZE_CASES = [0, 1, 512, 1023, 1024, 1025, 1024**2 - 1, 1024**2, 5 * 1024**2,
              1024**3, int(1.4 * 1024**3), 1024**4, 1024**5, 1024**6, 10**11]
TITLE_CASES = [
    ("[2009] Avatar [3D][AV1][4K]", "Avatar", "2009"),
    ("[2009] Avatar", "Avatar", "2009"),
    ("[1995] Heat [4K]", "Heat", "1995"),
    ("Heat", "Heat", ""),
    ("[4K][3D] Solo", "Solo", ""),  # identifiers stripped → no [..] left
    ("[1985] Ran [AV1]", "Ran", "1985"),
    ("[  1999  ] Spaces", "Spaces", "  1999  "),
    ("[1990 NoClose", "", "1990 NoClose"),  # quirk: no ']' → empty title
    ("Trailing [", "Trailing [", ""),  # '[' is last char → untouched
    ("[2001] 千と千尋 [3D]", "千と千尋", "2001"),
]


def test_hms_golden(spark):
    df = spark.createDataFrame([(s,) for s in HMS_CASES], "raw double").select(
        "raw",
        duration_hms("raw", concise=True).alias("concise"),
        duration_hms("raw", concise=False).alias("verbose"),
    )
    for row in df.collect():
        assert row["concise"] == model_hms(row["raw"], True), f"raw={row['raw']}"
        assert row["verbose"] == model_hms(row["raw"], False), f"raw={row['raw']}"


def test_hms_quirk_minute_carry():
    # 90 s: minutes = round(1.5) = 2 (half-to-even), seconds = 30
    assert model_hms(90.0) == "2m:30s"
    # 59.5 s: rounds to 60 → "1m", but the sub-minute branch (1 < raw < 60)
    # then overwrites seconds with round(59.5) = 60 → "1m:60s" (quirk = spec)
    assert model_hms(59.5) == "1m:60s"


def test_sizeof_golden(spark):
    df = spark.createDataFrame([(n,) for n in SIZE_CASES], "num long").select(
        "num", sizeof_fmt("num").alias("fmt")
    )
    for row in df.collect():
        assert row["fmt"] == model_sizeof(row["num"]), f"num={row['num']}"


def test_title_year_golden(spark):
    df = spark.createDataFrame([(c[0],) for c in TITLE_CASES], "stem string").select(
        "stem", parse_title("stem").alias("title"), parse_release_year("stem").alias("yr")
    )
    got = {r["stem"]: (r["title"], r["yr"]) for r in df.collect()}
    for stem, title, year in TITLE_CASES:
        assert got[stem] == (title, year), f"stem={stem!r} got={got[stem]}"


def test_extension_whitelist(spark):
    cases = [("a.MKV", True), ("b.mp4", True), ("c.txt", False), ("d", False),
             ("e.part1.mkv", True), ("f.srt", False), ("g.WEBM", True), ("h.", False)]
    df = spark.createDataFrame(cases, "name string, expected boolean").select(
        "name", "expected", is_video_file("name").alias("got"), extension_of("name").alias("ext")
    )
    for r in df.collect():
        assert r["got"] == r["expected"], f"{r['name']} ext={r['ext']}"
