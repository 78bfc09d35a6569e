"""Property tests on the parse expressions (SURVEY.md §5 test 3).

Each property compares the Spark column expression against an
independent pure-Python model of the reference's behavior
(re.findall / split / ast.literal_eval, main.py:23,73-75,118-150) on
hypothesis-generated lines. Alphabet is printable ASCII — the log
grammar is ASCII, and it sidesteps the Java-vs-Python ``\\d`` unicode
divergence that real log lines never exercise.
"""

from __future__ import annotations

import re
import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deloton_solo_spark.functions import parsing as P

ASCII = st.text(
    alphabet=string.ascii_letters + string.digits + " .-:;=[]{}_,/()",
    max_size=80,
)
LINES = st.lists(ASCII, min_size=1, max_size=25)

PROP_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _run(spark, lines, col):
    df = spark.createDataFrame([(s,) for s in lines], "log string")
    return [r.out for r in df.select(col.alias("out")).collect()]


@PROP_SETTINGS
@given(lines=LINES)
def test_nums_matches_re_findall(spark, lines):
    got = _run(spark, lines, P.nums(F.col("log")))
    want = [re.findall(r"\d+\.?\d*", s) for s in lines]
    assert got == want


@PROP_SETTINGS
@given(lines=LINES)
def test_nth_last_num_matches_negative_index(spark, lines):
    got = _run(spark, lines, P.nth_last_num(F.col("log"), 2))
    for g, s in zip(got, lines):
        toks = re.findall(r"\d+\.?\d*", s)
        want = float(toks[-2]) if len(toks) >= 2 else None
        assert g == want, s


@PROP_SETTINGS
@given(lines=LINES)
def test_ts_extract_matches_re_search(spark, lines):
    got = _run(
        spark,
        lines,
        F.date_format(P.ts_extract(F.col("log")), "yyyy-MM-dd HH:mm:ss"),
    )
    pat = re.compile(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}")
    for g, s in zip(got, lines):
        m = pat.search(s)
        if m is None:
            assert g is None, s
        else:
            # Spark's to_timestamp rejects impossible dates (month 13);
            # the reference's strptime would throw there too (main.py:55)
            # — both treat the line as unparseable.
            try:
                import datetime

                datetime.datetime.strptime(m.group(), "%Y-%m-%d %H:%M:%S")
            except ValueError:
                assert g is None, s
            else:
                assert g == m.group(), s


@PROP_SETTINGS
@given(lines=LINES)
def test_line_type_precedence(spark, lines):
    got = _run(spark, lines, P.line_type(F.col("log")))
    for g, s in zip(got, lines):
        if P.MARKERS["telemetry"] in s:
            want = "telemetry"
        elif P.MARKERS["ride"] in s:
            want = "ride"
        elif P.MARKERS["user_data"] in s:
            want = "user_data"
        elif P.MARKERS["user_fetch"] in s:
            want = "user_fetch"
        elif P.MARKERS["new_ride"] in s:
            want = "new_ride"
        else:
            want = "other"
        assert g == want, s


NAME = st.text(
    alphabet=string.ascii_letters + string.digits + " ", min_size=1, max_size=20
)
ADDR_SEG = st.text(
    alphabet=string.ascii_letters + string.digits + " ", min_size=1, max_size=15
)


@PROP_SETTINGS
@given(
    uid=st.integers(0, 2**40),
    name=NAME,
    segs=st.lists(ADDR_SEG, min_size=1, max_size=4),
    dob=st.integers(0, 2 * 10**12),
)
def test_user_struct_roundtrip(spark, uid, name, segs, dob):
    """Render a user dict the way the producer does (Python repr with
    single quotes), parse with the quote-normalizing from_json path
    (P4), and compare to ast-literal semantics field by field."""
    addr = ",".join(segs)
    line = (
        f"x data = {{'user_id': {uid}, 'name': '{name}', "
        f"'gender': 'male', 'address': '{addr}', 'date_of_birth': {dob}, "
        f"'height_cm': 180, 'weight_kg': 80, 'account_create_date': {dob}, "
        f"'original_source': 'offline'}}"
    )
    df = spark.createDataFrame([(line,)], "log string")
    row = df.select(P.user_struct(F.col("log")).alias("u")).collect()[0].u
    assert row.user_id == uid
    assert row.name == name
    assert row.address == addr
    assert row.date_of_birth == dob
    # and the derived cleansing ops on top:
    got = (
        df.select(
            P.strip_title(
                P.user_struct(F.col("log")).getField("name")
            ).alias("n"),
            P.postcode(
                P.user_struct(F.col("log")).getField("address")
            ).alias("p"),
        )
        .collect()[0]
    )
    toks = name.split(" ")
    want_name = " ".join(toks[1:]) if toks[0] in (
        "Mr", "Ms", "Dr", "Mrs", "Miss"
    ) else name
    assert got.n == want_name
    assert got.p == addr.split(",")[-1]
