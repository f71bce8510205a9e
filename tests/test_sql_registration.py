"""spark.sql UDF registration surface (the SQL-first user path)."""

from __future__ import annotations

from openccnet_spark.functions import register_sql_functions


def test_sql_functions(spark):
    names = register_sql_functions(spark)
    assert "cc_convert" in names
    spark.createDataFrame(
        [("几千只软件",), ("這是繁體字。",), (None,)], "text string"
    ).createOrReplaceTempView("docs")
    rows = spark.sql(
        """
        SELECT text,
               cc_convert(text, 's2t') AS s2t,
               cc_convert_punct('你好“世界”', 's2t') AS punct,
               cc_ts(text) AS ts,
               cc_zho_check(text) AS zho,
               cc_langid(text) AS lang,
               cc_ppl(text) AS ppl
        FROM docs
        """
    ).collect()
    by_text = {r.text: r for r in rows}
    assert by_text["几千只软件"].s2t == "幾千隻軟件"
    assert by_text["几千只软件"].zho == 2
    assert by_text["几千只软件"].punct == "你好「世界」"
    assert by_text["這是繁體字。"].ts == "这是繁体字。"
    assert by_text["這是繁體字。"].lang == "zh"
    assert by_text[None].s2t is None
    assert by_text["几千只软件"].ppl > 0


def test_cc_convert_null_config_propagates_null(spark):
    """A NULL config must yield NULL — never a silent conversion in the
    instance-default direction (code-review finding, round 4)."""
    from openccnet_spark.functions import register_sql_functions

    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT cc_convert(text, cfg) AS o, cc_convert_punct(text, cfg) AS p "
        "FROM VALUES ('软件', 's2t'), ('软件', CAST(NULL AS STRING)) AS v(text, cfg)"
    ).collect()
    assert rows[0].o == "軟件" and rows[0].p == "軟件"
    assert rows[1].o is None and rows[1].p is None
