"""The reference's REST query surface as an engine library — every
Flask route (api.py:57-188) mapped to its engine query plus the
JSON-records serialization edge (``to_json(orient="records")``,
api.py:66,...).

A user of the reference swaps ``requests.get(url)`` for
``serve(spark, sf_dir, route, **params)`` and receives the identical
shape: a JSON array of record objects. The delivery mechanism (Flask,
HTTP, module-global caching) is exactly what SURVEY.md §7 says we do
NOT port — this module is the capability boundary, not a web server.

Route → semantics (site cites the reference):
  /                      health echo                    (api.py:57-59)
  /ride/<id>             one ride by key                (api.py:62-67)
  /riders                all users                      (api.py:70-74)
  /rider/<id>            one user by key                (api.py:77-81)
  /riders/<gender>       users filtered by gender       (api.py:84-88)
  /rides                 all rides                      (api.py:91-94)
  /rides/<gender>        users⋈rides filtered by gender (api.py:97-107)
  /riders2?number=N|A-B  users by age / age range       (api.py:110-120)
  /rider/<id>/rides      rides of one user              (api.py:140-144)
  /daily?date=Y-M-D      rides by date parts            (api.py:148-181)
  /ride/del/<id>         delete a ride by key           (api.py:185-188)

Table mapping on the driver testdata: users ≙ customer
(c_custkey/c_mktsegment/c_acctbal), rides ≙ orders (o_orderkey/
o_custkey/o_orderdate) — same shapes the relational operators use.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.sinks import delete_by_keys


def _records(df: DataFrame, limit: int | None = None) -> str:
    """S8: the ``to_json(orient="records")`` edge — rows to a JSON
    array string. Driver-bound BY CONTRACT: this is the API-response
    serialization boundary (the rows leave Spark here), so the
    ``collect()`` is the declared edge, not a distributed-op smell.
    ``limit`` guards driver memory for full-table routes (the
    reference materializes everything; at scale you paginate)."""
    if limit is not None:
        df = df.limit(limit)
    rows = df.toJSON().collect()
    return "[" + ",".join(rows) + "]"


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("gender"),  # categorical stand-in
        (F.col("c_custkey") % 60 + 18).alias("age"),  # deterministic age
        F.col("c_acctbal").alias("acctbal"),
    )


def _rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ride_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("string").alias("start_time"),
        F.col("o_totalprice").alias("duration"),
    )


def serve(spark: SparkSession, sf_dir: str, route: str, **params) -> str:
    """Dispatch a reference route to its engine query; returns the JSON
    records string the Flask handler would have returned."""
    users, rides = _users(spark, sf_dir), _rides(spark, sf_dir)
    if route == "/":
        return json.dumps({"status": "ok"})  # api.py:57-59
    if route == "/ride":
        return _records(
            rides.filter(F.col("ride_id") == int(params["ride_id"]))
        )
    if route == "/riders":
        return _records(users, limit=params.get("limit"))
    if route == "/rider":
        return _records(
            users.filter(F.col("user_id") == int(params["user_id"]))
        )
    if route == "/riders/gender":
        return _records(users.filter(F.col("gender") == params["gender"]))
    if route == "/rides":
        return _records(rides, limit=params.get("limit"))
    if route == "/rides/gender":
        j = users.select("user_id", "gender", "age").join(rides, "user_id")
        return _records(j.filter(F.col("gender") == params["gender"]))
    if route == "/riders2":
        num = str(params["number"])
        if "-" in num:  # age range "lo-hi" (api.py:113-118)
            lo, hi = (int(x) for x in num.split("-"))
            return _records(users.filter(F.col("age").between(lo, hi)))
        return _records(users.filter(F.col("age") == int(num)))
    if route == "/rider/rides":
        return _records(
            rides.filter(F.col("user_id") == int(params["user_id"]))
        )
    if route == "/daily":
        # per-PART string equality on the split date (api.py:148-181,
        # minus its str-vs-int default-path bug which SURVEY.md §7
        # excludes). A prefix match would be wrong: '1995-1' must match
        # only month 1, never 1995-10/11/12, and each given part is
        # compared against the zero-padded storage form individually.
        d = str(params["date"])  # "YYYY[-M[-D]]"
        given = d.split("-")
        widths = (4, 2, 2)
        cond = F.lit(True)
        for i, part in enumerate(given[:3]):
            stored = F.split(F.col("start_time"), "-").getItem(i)
            cond = cond & (stored == part.zfill(widths[i]))
        return _records(rides.filter(cond))
    if route == "/ride/del":
        keys = spark.createDataFrame(
            [(int(params["ride_id"]),)], "ride_id long"
        )
        return _records(
            delete_by_keys(rides, F.broadcast(keys), ["ride_id"]),
            limit=params.get("limit"),
        )
    raise ValueError(f"unknown route: {route}")
