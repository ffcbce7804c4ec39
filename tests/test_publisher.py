"""Publisher façade tests: the three endpoint JSON contracts over a small
hand-built dau_info / order_wide table (FIXTURES.md §6), including the
edge params the reference mishandles (0-match item, page beyond last,
missing date partition)."""

from __future__ import annotations

import pytest

from sparkstreaming_realtime_project_spark.plans.publisher import (
    dau_realtime_json,
    detail_by_item_json,
    stats_by_item_json,
)


@pytest.fixture(scope="module")
def dau_table(spark):
    rows = [
        ("m1", "2024-01-02", "01"),
        ("m2", "2024-01-02", "01"),
        ("m3", "2024-01-02", "09"),
        ("m1", "2024-01-01", "10"),
        ("m4", "2024-01-01", "23"),
    ]
    return spark.createDataFrame(rows, "mid string, dt string, hr string")


@pytest.fixture(scope="module")
def wide_table(spark):
    rows = [
        # detail_id, dt, sku_name, gender, age, amount, create_time
        (1, "2024-01-02", "小米 手机 12", "F", 25, 100.0, "2024-01-02 10:00:00"),
        (2, "2024-01-02", "小米 手机 pro", "M", 35, 50.0, "2024-01-02 11:00:00"),
        (3, "2024-01-02", "苹果 手机", "F", 18, 70.0, "2024-01-02 12:00:00"),
        (4, "2024-01-02", "小米 电视", "F", 25, 30.0, "2024-01-02 13:00:00"),
        (5, "2024-01-01", "小米 手机 12", "F", 25, 999.0, "2024-01-01 10:00:00"),
    ]
    return spark.createDataFrame(
        rows,
        "detail_id long, dt string, sku_name string, user_gender string, "
        "user_age int, split_total_amount double, create_time string",
    )


def test_dau_realtime_contract(dau_table):
    out = dau_realtime_json(dau_table, "2024-01-02")
    assert out == {
        "dauTotal": 3,
        "dauTd": {"01": 2, "09": 1},
        "dauYd": {"10": 1, "23": 1},
    }


def test_dau_realtime_missing_partition(dau_table):
    """Reference warns on a missing daily index and returns 0
    (PublisherMapperImpl.java:61-63); rebuild returns empty buckets."""
    out = dau_realtime_json(dau_table, "2030-12-31")
    assert out == {"dauTotal": 0, "dauTd": {}, "dauYd": {}}


def test_stats_by_item_gender_and_age(wide_table):
    """A4+A6: AND-match '小米 手机' hits rows 1-2 only (row 4 lacks 手机,
    row 3 lacks 小米, row 5 is the other date)."""
    by_gender = stats_by_item_json(wide_table, "小米 手机", "2024-01-02", "gender")
    assert by_gender == [{"name": "女", "value": 100.0}, {"name": "男", "value": 50.0}]
    by_age = stats_by_item_json(wide_table, "小米 手机", "2024-01-02", "age")
    assert by_age == [
        {"name": "20岁到29岁", "value": 100.0},
        {"name": "30岁及30岁以上", "value": 50.0},
    ]


def test_stats_by_item_no_match(wide_table):
    assert stats_by_item_json(wide_table, "不存在 产品", "2024-01-02", "gender") == []


def test_stats_by_item_bad_t(wide_table):
    with pytest.raises(ValueError):
        stats_by_item_json(wide_table, "小米", "2024-01-02", "city")


def test_detail_by_item_paging_and_highlight(wide_table):
    out = detail_by_item_json(wide_table, "2024-01-02", "小米", page_no=1, page_size=2)
    assert out["total"] == 3  # rows 1, 2, 4 match 小米 on the date
    # deterministic order: create_time desc -> row 4 (13:00) then row 2 (11:00)
    assert [d["detail_id"] for d in out["detail"]] == [4, 2]
    assert "<em>小米</em>" in out["detail"][0]["sku_name"]
    # page past the end (reference: from beyond hits -> empty page)
    out2 = detail_by_item_json(wide_table, "2024-01-02", "小米", page_no=3, page_size=2)
    assert out2["total"] == 3 and out2["detail"] == []


# --- HTTP façade: the reference's REST routes end to end -------------------


@pytest.fixture(scope="module")
def http_base(dau_table, wide_table):
    from sparkstreaming_realtime_project_spark.http_api import (
        publisher_server,
        serve_in_background,
    )

    server = publisher_server(dau_table, wide_table)
    serve_in_background(server)
    host, port = server.server_address
    yield f"http://{host}:{port}"
    server.shutdown()


def _get(url: str):
    import json
    from urllib.request import urlopen
    from urllib.error import HTTPError

    try:
        with urlopen(url) as resp:
            return resp.status, json.loads(resp.read().decode("utf-8"))
    except HTTPError as e:
        return e.code, json.loads(e.read().decode("utf-8"))


def test_http_dau_realtime(http_base):
    """GET /dauRealtime?td= (PublisherController.java:26-33) returns the
    same shape the Vue dashboard consumes."""
    status, out = _get(f"{http_base}/dauRealtime?td=2024-01-02")
    assert status == 200
    assert out == {
        "dauTotal": 3,
        "dauTd": {"01": 2, "09": 1},
        "dauYd": {"10": 1, "23": 1},
    }


def test_http_stats_by_item(http_base):
    """GET /statsByItem?itemName=&date=&t= (PublisherController.java:36-42);
    UTF-8 query params and Chinese bucket labels round-trip."""
    from urllib.parse import quote

    q = quote("小米 手机")
    status, out = _get(f"{http_base}/statsByItem?itemName={q}&date=2024-01-02&t=gender")
    assert status == 200
    assert out == [{"name": "女", "value": 100.0}, {"name": "男", "value": 50.0}]


def test_http_detail_by_item(http_base):
    """GET /detailByItem?date=&itemName=&pageNo=&pageSize=
    (PublisherController.java:44-58): {total, detail} with highlight."""
    from urllib.parse import quote

    q = quote("小米")
    status, out = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}&pageNo=1&pageSize=2"
    )
    assert status == 200
    assert out["total"] == 3
    assert [d["detail_id"] for d in out["detail"]] == [4, 2]
    assert "<em>小米</em>" in out["detail"][0]["sku_name"]


def test_http_errors(http_base):
    """Missing required param and bad t are 400s with a JSON error body;
    unknown route is 404 (documented fix vs the reference's 500)."""
    status, out = _get(f"{http_base}/dauRealtime")
    assert status == 400 and "td" in out["error"]
    status, out = _get(f"{http_base}/statsByItem?itemName=x&date=2024-01-02&t=city")
    assert status == 400 and "gender" in out["error"]
    status, _ = _get(f"{http_base}/nope")
    assert status == 404


def test_http_reflects_live_streaming_sink(spark, tmp_path):
    """The provider contract end to end against the REAL streaming sink
    (http_api.py:12-15 claim): start the dau pipeline in availableNow
    mode, serve read_sink via the HTTP façade, then land MORE source
    files and replay — the SAME running server must reflect the second
    run's committed state on its next request (the analog of the
    reference's Spring app querying live daily ES indices)."""
    import json as _json

    from sparkstreaming_realtime_project_spark.http_api import (
        publisher_server,
        serve_in_background,
    )
    from sparkstreaming_realtime_project_spark.sources.streams import text_stream
    from sparkstreaming_realtime_project_spark.streaming.pipelines import dau_pipeline
    from sparkstreaming_realtime_project_spark.streaming.sinks import read_sink
    from pyspark.sql import functions as F

    from . import streaming_fixtures as fx

    in_dir, out, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    fx.write_log_fixture(in_dir)
    dim_user, dim_province = fx.dim_frames(spark)

    def run_pipeline():
        writer = dau_pipeline(
            text_stream(spark, in_dir, max_files_per_trigger=1),
            dim_user,
            dim_province,
            out,
            ckpt,
            as_of=F.lit("2024-06-01"),
        )
        q = writer.trigger(availableNow=True).start()
        assert q.awaitTermination(120)

    run_pipeline()
    server = publisher_server(lambda: read_sink(spark, out), lambda: read_sink(spark, out))
    serve_in_background(server)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        status, out1 = _get(f"{base}/dauRealtime?td=2024-01-02")
        assert status == 200
        assert out1["dauTotal"] == 1  # m2 is day-2's only active
        assert sum(out1["dauYd"].values()) == 2  # day-1: m1 + m5

        # land a third source file: a NEW device entering on day 2 plus a
        # cross-run duplicate of m2 (checkpoint state must still drop it)
        extra = [
            fx.log_row("m7", fx.D2_09 + 5000, uid="7", ar="11", page_id="home"),
            fx.log_row("m2", fx.D2_09 + 6000, uid="2", ar="12", page_id="home"),
        ]
        import os as _os

        path = _os.path.join(in_dir, "batch-002.json")
        with open(path, "w") as f:
            f.write("\n".join(extra) + "\n")
        run_pipeline()  # same checkpoint: replay picks up only the new file

        status, out2 = _get(f"{base}/dauRealtime?td=2024-01-02")
        assert status == 200
        assert out2["dauTotal"] == 2  # m2 + m7: provider re-read the sink
        assert out2["dauTd"].get("09") == 1  # m7's hour bucket
        assert sum(out2["dauYd"].values()) == 2  # day-1 untouched
    finally:
        server.shutdown()


def test_cjk_query_matches_unspaced_sku(wide_table, spark):
    """ES's standard analyzer tokenizes CJK one character per token
    (PublisherMapperImpl.java:143), so dashboard query 小米手机 must hit
    sku 小米11手机 even with NO whitespace — the round-9 divergence. The
    highlight wraps each maximal run of matched characters."""
    rows = [
        (1, "2024-01-02", "小米11手机", "F", 25, 100.0, "2024-01-02 10:00:00"),
        (2, "2024-01-02", "华为手机", "M", 35, 50.0, "2024-01-02 11:00:00"),
        (3, "2024-01-02", "小米平板", "F", 18, 70.0, "2024-01-02 12:00:00"),
        (4, "2024-01-02", "xiaomi 手机", "M", 40, 20.0, "2024-01-02 13:00:00"),
    ]
    wide = spark.createDataFrame(rows, wide_table.schema)
    out = detail_by_item_json(wide, "2024-01-02", "小米手机")
    # AND semantics: all four query chars must appear — only sku 1
    assert out["total"] == 1
    assert out["detail"][0]["detail_id"] == 1
    assert out["detail"][0]["sku_name"] == "<em>小米</em>11<em>手机</em>"
    # mixed Latin+CJK query: latin token whole-word, CJK per character
    out2 = detail_by_item_json(wide, "2024-01-02", "xiaomi 手机")
    assert out2["total"] == 1
    assert out2["detail"][0]["sku_name"] == "<em>xiaomi</em> <em>手机</em>"
    # stats route under the same analyzer
    stats = stats_by_item_json(wide, "小米手机", "2024-01-02", "gender")
    assert stats == [{"name": "女", "value": 100.0}]


def test_http_detail_keyset_walk(http_base):
    """GET /detailByItem with afterTime+afterId (the search_after param
    pair): page 2 via cursor equals page 2 via offset, and the response
    carries the next cursor + no total (track_total_hits=false idiom)."""
    from urllib.parse import quote

    q = quote("小米")
    _, p1 = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}&afterTime=&afterId=&pageSize=2"
    )
    assert [d["detail_id"] for d in p1["detail"]] == [4, 2]
    assert p1["last"] == {"create_time": "2024-01-02 11:00:00", "detail_id": 2}
    assert "total" not in p1
    at = quote(p1["last"]["create_time"])
    status, p2 = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}"
        f"&afterTime={at}&afterId={p1['last']['detail_id']}&pageSize=2"
    )
    assert status == 200
    _, off2 = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}&pageNo=2&pageSize=2"
    )
    assert [d["detail_id"] for d in p2["detail"]] == [
        d["detail_id"] for d in off2["detail"]
    ] == [1]
    assert p2["last"] == {"create_time": "2024-01-02 10:00:00", "detail_id": 1}
    # past the end: empty page, null cursor
    _, p3 = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}"
        f"&afterTime={quote(p2['last']['create_time'])}&afterId=1&pageSize=2"
    )
    assert p3 == {"detail": [], "last": None}


def test_http_detail_keyset_error_contracts(http_base):
    """Half cursors and non-numeric afterId are CLIENT faults: 400 with
    a JSON error body, never a dead handler thread; empty optional
    params keep their defaults instead of failing int('')."""
    from urllib.parse import quote

    q = quote("小米")
    at = quote("2024-01-02 11:00:00")
    # half cursor (afterTime without afterId)
    status, out = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}&afterTime={at}"
    )
    assert status == 400 and "together" in out["error"]
    # non-numeric afterId against the numeric detail_id column
    status, out = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}"
        f"&afterTime={at}&afterId=abc"
    )
    assert status == 400 and "afterId" in out["error"]
    # empty optional param falls back to its default (offset mode)
    status, out = _get(
        f"{http_base}/detailByItem?date=2024-01-02&itemName={q}&pageSize="
    )
    assert status == 200 and out["total"] == 3


def test_keyset_full_walk_reconstructs_total_order(wide_table, spark):
    """Walking keyset pages to exhaustion must reproduce EXACTLY the
    full (create_time DESC, detail_id ASC) match sequence — no row
    duplicated, none skipped — including across tied create_times."""
    from sparkstreaming_realtime_project_spark.plans.serving import (
        detail_by_item_keyset,
    )
    from pyspark.sql import functions as F

    full = [
        (r.create_time, r.detail_id)
        for r in wide_table.filter(
            (F.col("dt") == "2024-01-02") & F.col("sku_name").contains("小米")
        )
        .orderBy(F.col("create_time").desc(), "detail_id")
        .collect()
    ]
    walked, cursor = [], None
    for _ in range(10):  # bounded: 3 matches / page_size 1 -> 3 pages
        rows = detail_by_item_keyset(
            wide_table, "2024-01-02", "小米", after=cursor, page_size=1
        ).collect()
        if not rows:
            break
        walked.extend((r.create_time, r.detail_id) for r in rows)
        cursor = (rows[-1].create_time, rows[-1].detail_id)
    assert walked == full and len(walked) == 3
