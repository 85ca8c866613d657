"""Warm serving tier: rank identity with the distributed path, fallback
routing, and the HTTP front-end (reiz/web/api.py analog)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from reiz_io_spark.operators.score import IndexReader, naive_bm25_topk
from reiz_io_spark.plans.queries import lowered_reference_queries
from reiz_io_spark.serve import QueryService

K = 10


@pytest.fixture(scope="module")
def reader(spark, built_index):
    return IndexReader(spark, built_index[0])


@pytest.fixture(scope="module")
def service(reader):
    return QueryService(reader)


@pytest.mark.parametrize("name", sorted(lowered_reference_queries()))
def test_service_rank_identity(name, spark, reader, service):
    q = lowered_reference_queries()[name]
    got = [(r["doc_id"], r["score"]) for r in service.query_topk(q, k=K)]
    want = [
        (r["doc_id"], r["score"]) for r in naive_bm25_topk(reader, q, k=K).collect()
    ]
    assert got == want, name


def test_service_positions_match_structural(spark, reader, service):
    from reiz_io_spark.operators.verify import structural_topk

    q = lowered_reference_queries()["simple/not_constant"]
    got = service.query_positions(q, k=K)
    want_rows = structural_topk(reader, q, k=K).collect()
    want: dict[int, list[int]] = {}
    order = []
    for r in want_rows:
        if r["doc_id"] not in want:
            order.append(r["doc_id"])
        want.setdefault(r["doc_id"], []).append(r["lineno"])
    assert [r["doc_id"] for r in got] == order
    for r in got:
        assert r["linenos"] == sorted(want[r["doc_id"]])


def test_distributed_fallback_identical(spark, reader):
    svc = QueryService(reader, max_driver_postings=0)  # force wand route
    q = lowered_reference_queries()["simple/classmethod"]
    assert svc.analyze(q)["route"] == "distributed-wand"
    got = [(r["doc_id"], r["score"]) for r in svc.query_topk(q, k=K)]
    want = [
        (r["doc_id"], r["score"]) for r in naive_bm25_topk(reader, q, k=K).collect()
    ]
    assert got == want


def test_service_offset_paging(service):
    q = lowered_reference_queries()["simple/simple_name_match"]
    full = service.query_topk(q, k=6)
    page = service.query_topk(q, k=3, offset=3)
    assert [r["doc_id"] for r in page] == [r["doc_id"] for r in full[3:6]]
    assert [r["rank"] for r in page] == [4, 5, 6]


# --- HTTP front-end -----------------------------------------------------------


@pytest.fixture(scope="module")
def server(service):
    from reiz_io_spark.web import start_background

    # generous limits: these tests exercise routing/caching, not the
    # rate limiter (which has its own tiny-limit server below)
    httpd, port = start_background(service, per_minute=10_000, per_hour=100_000)
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(base: str, path: str, payload: dict) -> dict:
    req = urllib.request.Request(
        base + path,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return json.loads(e.read())


def test_http_query_matches_service(server, service):
    q = lowered_reference_queries()["simple/classmethod"]
    want = service.query_topk(q, k=K)
    got = _post(server, "/query", {"query": q.source, "limit": K})
    assert got["status"] == "success"
    assert got["results"] == [
        {k: v for k, v in r.items()} for r in json.loads(json.dumps(want))
    ]
    # second hit is served from the result cache (the Redis analog)
    again = _post(server, "/query", {"query": q.source, "limit": K})
    assert again["cached"] is True and again["results"] == got["results"]


def test_http_positions_and_analyze(server):
    src = "Return(not Constant())"
    got = _post(server, "/query", {"query": src, "limit": 5, "positions": True})
    assert got["status"] == "success" and got["results"]
    assert all("linenos" in r and r["linenos"] for r in got["results"])
    ana = _post(server, "/analyze", {"query": src})
    assert ana["status"] == "success"
    assert ana["groups"] and ana["route"] in ("driver-cache", "distributed-wand")


def test_http_errors_and_stats(server):
    assert _post(server, "/query", {})["status"] == "error"
    assert _post(server, "/query", {"query": ""})["results"] == []
    bad = _post(server, "/query", {"query": "Call(("})
    assert bad["status"] == "error" and "syntax" in bad["exception"]
    with urllib.request.urlopen(server + "/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["results"]["n_docs"] > 0
    # cache-tier observability: L1 count + shared L2 table stats
    rc = stats["results"]["result_cache"]
    assert rc["l1_entries"] >= 0 and rc["l2"]["entries"] >= 0


def test_positions_distributed_fallback_identical(spark, reader, service):
    """Hot queries route query_positions to the distributed verify
    stage; output must equal the driver-cache route."""
    svc0 = QueryService(reader, max_driver_postings=0)
    q = lowered_reference_queries()["simple/not_constant"]
    a = service.query_positions(q, k=5)
    b = svc0.query_positions(q, k=5)
    assert [(r["doc_id"], r["linenos"], r["score"]) for r in a] == [
        (r["doc_id"], r["linenos"], r["score"]) for r in b
    ]


def test_statistics_match_ast_walk(spark, small_corpus, service):
    """Module/AST/stmt/expr counts (the reference's /stats,
    reiz/fetch.py:12) must equal a direct ast.walk count over the
    parsed corpus."""
    import ast

    want = {"Module": 0, "AST": 0, "stmt": 0, "expr": 0}
    for r in small_corpus.filter("lang = 'python'").collect():
        try:
            tree = ast.parse(r["content"])
        except SyntaxError:
            continue
        for node in ast.walk(tree):
            want["AST"] += 1
            if isinstance(node, ast.Module):
                want["Module"] += 1
            if isinstance(node, ast.stmt):
                want["stmt"] += 1
            if isinstance(node, ast.expr):
                want["expr"] += 1
    got = service.statistics()
    assert {k: got[k] for k in want} == want


def test_http_batch_endpoint(server, service):
    qs = {name: q.source for name, q in
          sorted(lowered_reference_queries().items())[:5]}
    qs["bad"] = "Call(("
    got = _post(server, "/batch", {"queries": qs, "limit": 5})
    assert got["status"] == "success"
    assert "bad" in got["errors"]
    for name in list(qs)[:5]:
        if name == "bad":
            continue
        want = service.query_topk(lowered_reference_queries()[name], k=5)
        assert [r["doc_id"] for r in got["results"][name]] == [
            r["doc_id"] for r in want
        ], name


def test_rate_limit_minute_and_hour_tiers(service):
    """Reference parity: "240 per hour;10/minute" (reiz/web/api.py:72) —
    both windows enforce 429 independently, and results carry the
    github_link/username projection (fetch.py:95-107)."""
    from reiz_io_spark.web import start_background

    httpd, port = start_background(service, per_minute=3, per_hour=100_000)
    base = f"http://127.0.0.1:{port}"
    try:
        codes = []
        for _ in range(5):
            r = _post(base, "/query", {"query": "Call(Name('len'))", "limit": 2})
            codes.append(r.get("status"))
        assert codes[:3] == ["success"] * 3
        assert "error" in codes[3:]  # minute tier kicked in
    finally:
        httpd.shutdown()

    httpd, port = start_background(service, per_minute=10_000, per_hour=2)
    base = f"http://127.0.0.1:{port}"
    try:
        r1 = _post(base, "/query", {"query": "Call(Name('len'))", "limit": 2})
        r2 = _post(base, "/query", {"query": "Call(Name('sum'))", "limit": 2})
        r3 = _post(base, "/query", {"query": "Call(Name('max'))", "limit": 2})
        assert r1["status"] == "success" and r2["status"] == "success"
        assert r3["status"] == "error" and "rate limit" in r3["exception"]
        for res in r1["results"]:
            assert res["github_link"].startswith("https://github.com/")
            assert res["username"] == res["repo"].split("/")[0]
    finally:
        httpd.shutdown()


def test_result_cache_is_bounded_lru(service):
    """A long-lived server must not grow without bound: with cache_max=2
    the third distinct query evicts the first (it re-executes: cached
    False on re-request)."""
    from reiz_io_spark.web import start_background

    # L1-only server: this test is about the in-process LRU bound (the
    # shared L2 tier would satisfy the evicted re-request; it has its
    # own tests below)
    httpd, port = start_background(
        service, per_minute=10_000, per_hour=100_000, cache_max=2,
        shared_cache=False,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        q1 = {"query": "Call(Name('len'))", "limit": 2}
        q2 = {"query": "Call(Name('sum'))", "limit": 2}
        q3 = {"query": "Call(Name('max'))", "limit": 2}
        assert _post(base, "/query", q1)["cached"] is False
        assert _post(base, "/query", q1)["cached"] is True  # hit
        _post(base, "/query", q2)
        _post(base, "/query", q3)  # evicts q1 (LRU, max 2)
        assert _post(base, "/query", q1)["cached"] is False
    finally:
        httpd.shutdown()


def test_shared_cache_across_frontends(service, monkeypatch):
    """Reference parity (reiz/web/api.py:50-63 — ONE Redis shared by
    all sanic workers): two share-nothing frontends over the same index
    snapshot; the second frontend's first identical query is a shared
    hit and does NOT re-execute."""
    from reiz_io_spark.serve import QueryService
    from reiz_io_spark.web import start_background

    calls = {"n": 0}
    orig = QueryService.query_topk

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(QueryService, "query_topk", counting)

    body = {"query": "Call(Name('sorted'))", "limit": 3}
    a, port_a = start_background(service, per_minute=10_000, per_hour=100_000)
    b, port_b = start_background(service, per_minute=10_000, per_hour=100_000)
    try:
        r1 = _post(f"http://127.0.0.1:{port_a}", "/query", body)
        assert r1["cached"] is False and calls["n"] == 1
        # frontend B has a cold private L1 but sees A's L2 entry
        r2 = _post(f"http://127.0.0.1:{port_b}", "/query", body)
        assert r2["cached"] == "shared"
        assert r2["results"] == r1["results"]
        assert calls["n"] == 1  # never re-executed
        # and B's L1 is now warm
        r3 = _post(f"http://127.0.0.1:{port_b}", "/query", body)
        assert r3["cached"] is True and calls["n"] == 1
    finally:
        a.shutdown()
        b.shutdown()


def test_shared_cache_version_invalidation(tmp_path):
    """A merge that flips the snapshot version makes every old entry
    unreachable by filename construction; the stale file then AGES OUT
    by mtime under the size bound (prune never opens it)."""
    from reiz_io_spark.result_cache import SharedResultCache

    d = str(tmp_path / "ix")
    c1 = SharedResultCache(d, version=1, max_entries=4)
    c1.put("q", [1, 2, 3])
    assert c1.get("q") == [1, 2, 3]
    c2 = SharedResultCache(d, version=2, max_entries=4)
    assert c2.get("q") is None  # new snapshot -> old entry unreachable
    # enough puts to cross the amortized size check; the v1 file is the
    # oldest entry, so the mtime prune removes it first
    for i in range(c2.PRUNE_CHECK_EVERY + 4):
        c2.put(f"q{i}", [i])
    assert c1.get("q") is None  # aged out
    # bounded: pruned to the low watermark at the check, plus at most
    # the post-check puts
    entries = c2.stats()["entries"]
    assert entries <= 4 + 4


def test_shared_cache_prune_zero_content_reads(tmp_path, monkeypatch):
    """VERDICT r05 item 7: at steady state (directory far over the
    bound — 5k entries against max 1000) pruning must do ZERO content
    reads (json.load is the only content-read path) and keep the
    directory bounded; the O(entries) listing itself is amortized over
    PRUNE_CHECK_EVERY puts."""
    from reiz_io_spark import result_cache as rc

    d = str(tmp_path / "ix")
    c = rc.SharedResultCache(d, version=1, max_entries=1000)
    reads = {"n": 0}
    real_load = rc.json.load

    def counting_load(*a, **k):
        reads["n"] += 1
        return real_load(*a, **k)

    monkeypatch.setattr(rc.json, "load", counting_load)
    for i in range(5000):
        c.put(f"req{i}", {"rows": [i]})
    assert reads["n"] == 0, f"prune opened {reads['n']} entry files"
    entries = c.stats()["entries"]
    assert entries <= 1000 + c.PRUNE_CHECK_EVERY  # bounded
    assert entries < 5000  # prune actually ran
    # hot entries survive: the most recent puts are still readable
    assert c.get("req4999") == {"rows": [4999]}
