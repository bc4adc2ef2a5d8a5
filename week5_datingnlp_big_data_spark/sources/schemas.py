"""Explicit StructTypes for every table the engine reads.

Deterministic schemas (SURVEY.md section 1: "explicit StructType preferred")
replace the reference's ``read.csv(..., stringsAsFactors=FALSE)`` type
inference (reference Week5_datingNLP.R:45). Shapes verified against the
driver parquet at /root/testdata/sf0.001 (FIXTURES.md section 1).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, T.StructType] = {
    "region": _struct(
        ("r_regionkey", T.IntegerType()),
        ("r_name", T.StringType()),
    ),
    "nation": _struct(
        ("n_nationkey", T.IntegerType()),
        ("n_name", T.StringType()),
        ("n_regionkey", T.IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", T.LongType()),
        ("c_name", T.StringType()),
        ("c_nationkey", T.IntegerType()),
        ("c_acctbal", T.DoubleType()),
        ("c_mktsegment", T.StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", T.LongType()),
        ("s_name", T.StringType()),
        ("s_nationkey", T.IntegerType()),
        ("s_acctbal", T.DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", T.LongType()),
        ("p_name", T.StringType()),
        ("p_brand", T.StringType()),
        ("p_type", T.StringType()),
        ("p_size", T.IntegerType()),
        ("p_retailprice", T.DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", T.LongType()),
        ("o_custkey", T.LongType()),
        ("o_orderstatus", T.StringType()),
        ("o_totalprice", T.DoubleType()),
        ("o_orderdate", T.TimestampType()),
        ("o_orderpriority", T.StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", T.LongType()),
        ("l_partkey", T.LongType()),
        ("l_suppkey", T.LongType()),
        ("l_linenumber", T.IntegerType()),
        ("l_quantity", T.DoubleType()),
        ("l_extendedprice", T.DoubleType()),
        ("l_discount", T.DoubleType()),
        ("l_tax", T.DoubleType()),
        ("l_returnflag", T.StringType()),
        ("l_linestatus", T.StringType()),
        ("l_shipdate", T.TimestampType()),
    ),
    "events": _struct(
        ("event_id", T.LongType()),
        ("ts", T.TimestampType()),
        ("user_id", T.LongType()),
        ("event_type", T.StringType()),
        ("value", T.DoubleType()),
        ("props", T.StringType()),
    ),
    "documents": _struct(
        ("doc_id", T.LongType()),
        ("text", T.StringType()),
        ("lang", T.StringType()),
        ("source", T.StringType()),
        ("n_chars", T.LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", T.LongType()),
        ("embedding", T.ArrayType(T.FloatType())),
        ("label", T.IntegerType()),
    ),
}

# Reference-shaped profiles corpus (okcupid_profiles.csv, 59,946 x 31 —
# reference Week5_datingNLP.out.txt:1 str(profiles)). Used by the golden
# pipeline fixture (FIXTURES.md section 2).
ESSAY_COLS = [f"essay{i}" for i in range(10)]

PROFILES_SCHEMA = _struct(
    ("doc_id", T.LongType()),
    ("age", T.IntegerType()),
    ("status", T.StringType()),
    ("sex", T.StringType()),
    ("orientation", T.StringType()),
    ("body_type", T.StringType()),
    ("diet", T.StringType()),
    ("drinks", T.StringType()),
    ("drugs", T.StringType()),
    ("education", T.StringType()),
    ("ethnicity", T.StringType()),
    ("height", T.DoubleType()),
    ("income", T.IntegerType()),
    ("job", T.StringType()),
    ("last_online", T.StringType()),
    ("location", T.StringType()),
    ("offspring", T.StringType()),
    ("pets", T.StringType()),
    ("religion", T.StringType()),
    ("sign", T.StringType()),
    ("smokes", T.StringType()),
    ("speaks", T.StringType()),
    *[(c, T.StringType()) for c in ESSAY_COLS],
)
