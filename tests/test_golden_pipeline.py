"""Golden end-to-end pipeline test (SURVEY.md §5 test 2).

An independent, line-by-line faithful re-implementation of the
reference's ``data_cleanser`` loop semantics (observed at
/root/reference/deloton_stuff/main.py:69-184) is run over the exact
well-formed log the Spark pipeline consumes; outputs must match the
declarative Spark plans row for row.

This is deliberately a SECOND implementation path (imperative,
driver-side) so a shared bug between the Spark query and its DuckDB
oracle cannot hide: three independent engines now agree.
"""

from __future__ import annotations

import ast
import datetime
import re

import pytest

from deloton_solo_spark.functions import parsing as P
from deloton_solo_spark.functions.ridelog import well_formed_ride_log
from deloton_solo_spark.operators.pipeline import (
    ride_ingest_pipeline,
    users_ingest_pipeline,
)

from .conftest import SF_DIR

DATA_RE = re.compile(r"{[\s\S]*}")
NUM_RE = re.compile(r"\d+\.?\d*")
STOP_WORDS = ["Mr", "Ms", "Dr", "Mrs", "Miss"]


def golden_cleanser(lines: list[str]):
    """Faithful port of the observed loop semantics (main.py:69-175):
    marker resets, state forward-fill, emit-per-non-marker-line,
    global first-occurrence user dedup, per-user 2nd/last/mean agg,
    [1:-1] group drop. Returns (users_rows, rides_rows_aggregated)."""
    users_rows, rides_rows = [], []
    start_datetime = ""
    start_time = ""
    duration = 0
    resistance = 0
    hrt = 0
    rpm = 0
    power = 0
    existing_user: set = set()
    user_dict = {"user_id": None}

    for log in lines:
        if "--------- beginning of a new ride" in log:
            start_datetime = 0  # the reference's int-reset quirk
            duration = resistance = hrt = rpm = power = 0
            user_dict = {"user_id": None}
        else:
            if "Getting user data from server" in log:
                start_datetime = log.split(" ")[0]
                start_time = log.split(" ")[1]
            if "data = " in log:
                user_dict = ast.literal_eval(DATA_RE.findall(log)[0])
                age = (
                    P.AGE_ANCHOR_YEAR
                    - datetime.datetime.fromtimestamp(
                        user_dict["date_of_birth"] / 1000,
                        tz=datetime.timezone.utc,
                    ).year
                )
                if user_dict["user_id"] not in existing_user:
                    existing_user.add(user_dict["user_id"])
                    name = user_dict["name"].split(" ")
                    if name[0] in STOP_WORDS:
                        name.pop(0)
                    address = user_dict["address"].split(",")
                    users_rows.append(
                        {
                            "user_id": user_dict["user_id"],
                            "name": " ".join(name),
                            "gender": user_dict["gender"],
                            "age": age,
                            "height": user_dict["height_cm"],
                            "weight": user_dict["weight_kg"],
                            "account_created": datetime.datetime.fromtimestamp(
                                user_dict["account_create_date"] / 1000,
                                tz=datetime.timezone.utc,
                            ).strftime("%Y-%m-%d %H:%M:%S"),
                            "original_source": str(
                                user_dict["original_source"]
                            ),
                            "postcode": address[-1],
                        }
                    )
            elif "Ride - " in log:
                nums = NUM_RE.findall(log)
                duration, resistance = nums[-2], nums[-1]
            elif "Telemetry -" in log:
                nums = NUM_RE.findall(log)
                hrt, rpm, power = nums[-3], nums[-2], nums[-1]
            rides_rows.append(
                [
                    str(start_datetime) + " " + str(start_time),
                    float(duration),
                    int(resistance),
                    float(rpm),
                    float(power),
                    int(hrt),
                    user_dict["user_id"],
                ]
            )

    # main.py:160-175 — group by trailing user_id, transpose, aggregate.
    ride_dict: dict = {}
    for elem in rides_rows:
        ride_dict.setdefault(elem[-1], []).append(elem[:-1])
    sql_list = []
    for uid, rows in ride_dict.items():
        cols = list(zip(*rows))
        sql_list.append(
            {
                "user_id": uid,
                "start_time": cols[0][1],
                "duration": cols[1][-1],
                "avg_resistance": sum(cols[2]) / len(cols[2]),
                "avg_rpm": sum(cols[3]) / len(cols[3]),
                "avg_power": sum(cols[4]) / len(cols[4]),
                "avg_hrt": sum(cols[5]) / len(cols[5]),
            }
        )
    return users_rows, sql_list[1:-1]


@pytest.fixture(scope="module")
def golden(spark):
    log = well_formed_ride_log(spark, SF_DIR)
    lines = [r.log for r in log.orderBy("msg_idx").collect()]
    return golden_cleanser(lines)


def test_rides_pipeline_matches_golden(spark, golden):
    _, golden_rides = golden
    got = {
        r["user_id"]: r
        for r in (
            row.asDict()
            for row in ride_ingest_pipeline(spark, SF_DIR).collect()
        )
    }
    want = {r["user_id"]: r for r in golden_rides}
    assert set(got) == set(want)
    for uid, w in want.items():
        g = got[uid]
        assert g["start_time"] == w["start_time"], uid
        assert g["duration"] == pytest.approx(w["duration"]), uid
        for c in ("avg_resistance", "avg_rpm", "avg_power", "avg_hrt"):
            # Spark/oracle round to 4dp; golden is the raw mean.
            assert g[c] == pytest.approx(round(w[c], 4), abs=1e-9), (uid, c)


def test_users_pipeline_matches_golden(spark, golden):
    golden_users, _ = golden
    got = sorted(
        (row.asDict() for row in users_ingest_pipeline(spark, SF_DIR).collect()),
        key=lambda r: r["user_id"],
    )
    want = sorted(golden_users, key=lambda r: r["user_id"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g, w)
