"""spark.sql() over registered views must express the same endpoint
semantics as the DataFrame plans (S6: the API layer can emit either)."""

from __future__ import annotations

import pytest

from ton_indexer_spark.catalog import Catalog


def test_sql_equals_dataframe_plan(spark, fixture_dir):
    from ton_indexer_spark.plans import transactions_query

    cat = Catalog(spark, fixture_dir)
    cat.register_views(("transactions", "messages", "message_contents"))

    acc = cat.transactions.groupBy("account").count().orderBy(
        "count", "account", ascending=[False, True]
    ).first()["account"]

    df_plan = transactions_query(cat, accounts=[acc], sort="desc", limit=20,
                                 with_messages=False)
    sql_plan = spark.sql(
        f"""
        SELECT * FROM transactions
        WHERE account = '{acc}'
        ORDER BY lt DESC, lt DESC, account ASC, hash ASC
        LIMIT 20
        """
    )
    a = [tuple(str(x) for x in (r["hash"], r["lt"])) for r in df_plan.collect()]
    b = [tuple(str(x) for x in (r["hash"], r["lt"])) for r in sql_plan.collect()]
    assert a == b


def test_sql_inout_fold_equals_pivot(spark, fixture_dir):
    from ton_indexer_spark.plans import messages_query

    cat = Catalog(spark, fixture_dir)
    cat.register_views(("messages", "message_contents"))
    df_plan = messages_query(cat, exclude_externals=True, sort="asc",
                             limit=100, with_body=False)
    sql_plan = spark.sql(
        """
        WITH folded AS (
            SELECT msg_hash,
                   MAX(CASE WHEN direction = 'in' THEN tx_hash END) AS in_tx_hash,
                   MAX(CASE WHEN direction = 'out' THEN tx_hash END) AS out_tx_hash,
                   MIN(created_lt) AS created_lt
            FROM messages WHERE source IS NOT NULL GROUP BY msg_hash
        )
        SELECT msg_hash, in_tx_hash, out_tx_hash
        FROM folded ORDER BY created_lt ASC, msg_hash ASC LIMIT 100
        """
    )
    a = [tuple(map(str, (r["msg_hash"], r["in_tx_hash"], r["out_tx_hash"])))
         for r in df_plan.collect()]
    b = [tuple(map(str, r)) for r in sql_plan.collect()]
    assert a == b
