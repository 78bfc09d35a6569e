"""Log-line parsing expressions — the reference's ETL "cleanser" scalar
surface (SURVEY.md §2.2, P1-P11) as composable Column builders.

Everything is built-in Spark SQL functions (JVM, codegen) — zero Python
UDFs, including P4's Python-dict-literal parse which is handled with
quote normalization + ``from_json`` (SURVEY.md §2.7).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: P1 — timestamp prefix pattern (main.py:23).
TS_PATTERN = r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}"

#: P9 — numeric token pattern (main.py:74).
NUM_PATTERN = r"\d+\.?\d*"

#: Line-shape markers (main.py:99,118,127,140,146).
MARKERS = {
    "new_ride": "beginning of a new ride",
    "user_fetch": "Getting user data",
    "user_data": "data = {",
    "ride": "Ride - ",
    "telemetry": "Telemetry - ",
}

#: P4 — schema of the embedded user dict (main.py:129-137).
USER_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("name", StringType()),
        StructField("gender", StringType()),
        StructField("address", StringType()),
        StructField("date_of_birth", LongType()),
        StructField("height_cm", LongType()),
        StructField("weight_kg", LongType()),
        StructField("account_create_date", LongType()),
        StructField("original_source", StringType()),
    ]
)


def ts_extract(log: Column) -> Column:
    """P1: second-precision timestamp from anywhere in the line
    (main.py:23,54-55). ``try_to_timestamp`` so a malformed line yields
    NULL instead of failing the job under ANSI mode — at 100 TB one bad
    record must not kill the stage (property-tested)."""
    return F.try_to_timestamp(
        F.nullif(F.regexp_extract(log, TS_PATTERN, 0), F.lit(""))
    )


def line_type(log: Column) -> Column:
    """P2: five-way dispatch by substring containment (main.py:99,...)."""
    out = F.lit("other")
    for name in ("telemetry", "ride", "user_data", "user_fetch", "new_ride"):
        out = F.when(log.contains(MARKERS[name]), F.lit(name)).otherwise(out)
    return out


def nums(log: Column) -> Column:
    """P9: all numeric tokens, positional pick via element_at(…, -k)
    (main.py:74,141-150)."""
    return F.regexp_extract_all(log, F.lit(NUM_PATTERN), 0)


def nth_last_num(log: Column, k: int) -> Column:
    """k-th numeric token from the end, as double (main.py:141-150).
    ``try_element_at``: short token lists yield NULL, not an ANSI
    index error (the reference would IndexError there, main.py:142;
    we degrade to NULL instead of crashing — property-tested)."""
    return F.try_element_at(nums(log), F.lit(-k)).cast("double")


def split_datetime_parts(log: Column) -> tuple[Column, Column]:
    """P3: date = token 0, time = token 1 (main.py:118-123); NULL on
    lines with too few tokens."""
    parts = F.split(log, " ")
    return (
        F.try_element_at(parts, F.lit(1)),
        F.try_element_at(parts, F.lit(2)),
    )


def user_struct(log: Column) -> Column:
    """P4: Python-dict literal → struct. The source is single-quoted
    (``ast.literal_eval`` in the reference, main.py:127-129); we
    normalize quotes then ``from_json``. Assumes values themselves
    contain no single quotes — holds for the log grammar (names and
    addresses never embed apostrophes, FIXTURES.md B1)."""
    blob = F.regexp_extract(log, r"\{[\s\S]*\}", 0)
    jsonish = F.regexp_replace(blob, "'", '"')
    return F.from_json(jsonish, USER_SCHEMA)


#: Deterministic "today" anchor for P5. The reference uses wall-clock
#: ``now().year`` (main.py:130); pinning the year keeps the Spark
#: expression and the DuckDB oracle bit-identical regardless of host
#: timezone or the instant each side evaluates (current_date() in a
#: UTC-pinned session vs DuckDB's process-local current_date can
#: disagree around midnight / year boundaries).
AGE_ANCHOR_YEAR = 2026


def age_from_epoch_ms(ms: Column) -> Column:
    """P5: calendar-year difference, not birthday-accurate — parity
    quirk kept (main.py:130). 'This year' is the pinned
    :data:`AGE_ANCHOR_YEAR` shared with every oracle twin."""
    return F.lit(AGE_ANCHOR_YEAR) - F.year(F.timestamp_millis(ms))


def strip_title(name: Column) -> Column:
    """P6: drop a leading honorific (main.py:75,133-135).

    The reference pops the first SINGLE-SPACE token (``name.split(' ')``
    then ``pop(0)``), so a bare title strips to '' and a double space
    after the title survives as a leading space — ``( |$)`` (not
    ``\\s+``) reproduces both edges exactly (hypothesis-found, round 8).
    """
    return F.regexp_replace(name, r"^(Mr|Ms|Dr|Mrs|Miss)( |$)", "")


def postcode(address: Column) -> Column:
    """P7: last comma-segment of the address (main.py:136-137)."""
    return F.element_at(F.split(address, ","), -1)


def epoch_ms_to_ts_str(ms: Column) -> Column:
    """P8: epoch-millis → 'YYYY-MM-DD HH:MM:SS' string (main.py:137).
    Second precision, UTC (session tz pinned)."""
    return F.date_format(F.timestamp_millis(ms), "yyyy-MM-dd HH:mm:ss")
