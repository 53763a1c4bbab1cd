"""Declared schema contracts for the driver testdata tables (FIXTURES.md §2).

Readers infer from parquet footers (cheap, correct); these declarations are
the CONTRACT — `tests/test_schemas.py` asserts footer == declaration, so
silent testdata drift (or a wrong reader conf, like the nanos handling)
fails loudly instead of corrupting oracle comparisons.

``events.ts`` is declared as it appears AFTER ``read_table``'s nanos->micros
conversion (the raw footer is TIMESTAMP(NANOS), unreadable by Spark 4
without the legacy conf; see sources/parquet.py).
"""

from __future__ import annotations

#: table -> Spark simpleString schema (post-read_table)
EXPECTED_SCHEMAS: dict[str, str] = {
    "region": "struct<r_regionkey:int,r_name:string>",
    "nation": "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "customer": (
        "struct<c_custkey:bigint,c_name:string,c_nationkey:int,"
        "c_acctbal:double,c_mktsegment:string>"
    ),
    "supplier": "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>",
    "part": (
        "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,"
        "p_size:int,p_retailprice:double>"
    ),
    "orders": (
        "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,"
        "o_totalprice:double,o_orderdate:timestamp,o_orderpriority:string>"
    ),
    "lineitem": (
        "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,"
        "l_linenumber:int,l_quantity:double,l_extendedprice:double,"
        "l_discount:double,l_tax:double,l_returnflag:string,"
        "l_linestatus:string,l_shipdate:timestamp>"
    ),
    "events": (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double,props:string>"
    ),
    "documents": (
        "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"
    ),
    "embeddings": "struct<vec_id:bigint,embedding:array<float>,label:int>",
}
