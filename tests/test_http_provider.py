"""OpenAIHttpProvider against a local fake server — network-off semantics.

The reference's client behavior (embed + chat against an OpenAI-compatible
endpoint, 60 s timeout, RAG.java:87-94) is exercised here with a stdlib
http.server fake so tests never touch the network. Deterministic local
providers remain the engine default; this suite only proves the HTTP path
(batching, index-order restoration, retry/backoff, fail-fast on 4xx,
auth header, picklability for executor shipping).
"""

from __future__ import annotations

import json
import os
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pandas as pd
import pytest

from flink_rag_spark.functions.providers import OpenAIHttpProvider


class _FakeOpenAI(BaseHTTPRequestHandler):
    """Minimal OpenAI-compatible endpoint with scriptable failures."""

    # class-level state, reset per fixture
    requests: list[dict] = []
    fail_next: list[int] = []  # HTTP codes to emit before succeeding
    hang_next: list[float] = []  # seconds to sleep (hung upstream) first
    auth_headers: list[str | None] = []

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls = _FakeOpenAI
        cls.requests.append({"path": self.path, "body": body})
        cls.auth_headers.append(self.headers.get("Authorization"))
        if cls.hang_next:
            import time
            time.sleep(cls.hang_next.pop(0))
        if cls.fail_next:
            code = cls.fail_next.pop(0)
            self.send_response(code)
            self.end_headers()
            self.wfile.write(b"{}")
            return
        if self.path == "/embeddings":
            texts = body["input"]
            # deliberately reversed index order: client must re-sort by index
            data = [{"index": i, "embedding": [float(len(t)), float(i)]}
                    for i, t in enumerate(texts)][::-1]
            resp = {"data": data, "model": body["model"]}
        elif self.path == "/chat/completions":
            content = "echo:" + body["messages"][0]["content"]
            resp = {"choices": [{"message": {"content": content}}]}
        elif self.path == "/rerank":
            # score = doc length; results deliberately out of order —
            # the client must realign by the returned index
            docs = body["documents"]
            resp = {"results": [{"index": i,
                                 "relevance_score": float(len(d))}
                                for i, d in enumerate(docs)][::-1]}
        else:
            self.send_response(404)
            self.end_headers()
            return
        out = json.dumps(resp).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence per-request stderr noise
        pass


@pytest.fixture()
def fake_server():
    _FakeOpenAI.requests = []
    _FakeOpenAI.fail_next = []
    _FakeOpenAI.hang_next = []
    _FakeOpenAI.auth_headers = []
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()
        srv.server_close()


def _provider(url: str, **kw) -> OpenAIHttpProvider:
    kw.setdefault("max_retries", 2)
    kw.setdefault("timeout_s", 5.0)
    return OpenAIHttpProvider(base_url=url, **kw)


def test_embed_batches_and_restores_index_order(fake_server):
    p = _provider(fake_server, batch_size=2)
    texts = pd.Series(["a", "bb", "ccc", "dddd", "eeeee"])
    out = p.embed_batch(texts)
    # one request per ceil(5/2)=3 chunks
    embed_reqs = [r for r in _FakeOpenAI.requests if r["path"] == "/embeddings"]
    assert len(embed_reqs) == 3
    assert embed_reqs[0]["body"]["input"] == ["a", "bb"]
    # server returned data reversed; embeddings must still line up with input
    assert [v[0] for v in out] == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert list(out.index) == list(texts.index)


def test_chat_returns_contents_in_order(fake_server):
    p = _provider(fake_server, max_concurrency=3)
    prompts = pd.Series([f"q{i}" for i in range(7)])
    out = p.chat_batch(prompts)
    assert list(out) == [f"echo:q{i}" for i in range(7)]
    chat_reqs = [r for r in _FakeOpenAI.requests
                 if r["path"] == "/chat/completions"]
    assert len(chat_reqs) == 7
    # reference knob parity: temperature/top_p/max_tokens on every request
    for r in chat_reqs:
        assert r["body"]["temperature"] == pytest.approx(0.25)
        assert r["body"]["top_p"] == pytest.approx(0.9)
        assert r["body"]["max_tokens"] == 256


def test_retries_on_503_then_succeeds(fake_server):
    _FakeOpenAI.fail_next = [503, 429]
    p = _provider(fake_server, batch_size=8)
    out = p.embed_batch(pd.Series(["hello"]))
    assert out.iloc[0] == [5.0, 0.0]
    assert len(_FakeOpenAI.requests) == 3  # 2 failures + 1 success


def test_fails_fast_on_client_error(fake_server):
    _FakeOpenAI.fail_next = [400]
    p = _provider(fake_server)
    with pytest.raises(Exception):
        p.embed_batch(pd.Series(["x"]))
    assert len(_FakeOpenAI.requests) == 1  # no retry on non-retryable 4xx


def test_exhausted_retries_raise(fake_server):
    _FakeOpenAI.fail_next = [503, 503, 503, 503]
    p = _provider(fake_server, max_retries=1)
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        p.chat_batch(pd.Series(["x"]))


def test_api_key_read_from_env_at_call_time(fake_server, monkeypatch):
    monkeypatch.setenv("FAKE_PROVIDER_KEY", "sk-test-123")
    p = _provider(fake_server, api_key_env="FAKE_PROVIDER_KEY")
    p.chat_batch(pd.Series(["hi"]))
    assert _FakeOpenAI.auth_headers[-1] == "Bearer sk-test-123"
    # and absent env → no Authorization header, no crash
    monkeypatch.delenv("FAKE_PROVIDER_KEY")
    p.chat_batch(pd.Series(["hi"]))
    assert _FakeOpenAI.auth_headers[-1] is None


def test_provider_is_picklable_and_holds_no_secrets(fake_server):
    os.environ["SOME_KEY_ENV"] = "sk-secret"
    try:
        p = _provider(fake_server, api_key_env="SOME_KEY_ENV")
        blob = pickle.dumps(p)
        assert b"sk-secret" not in blob  # key resolved on executor, not shipped
        p2 = pickle.loads(blob)
        assert p2.base_url == p.base_url
        out = p2.chat_batch(pd.Series(["roundtrip"]))
        assert out.iloc[0] == "echo:roundtrip"
    finally:
        del os.environ["SOME_KEY_ENV"]


def test_hung_upstream_times_out_bounded(fake_server):
    """The reference bounds every chat call (RAG.java:93, 60 s). A hung
    upstream must be cut by timeout_s per attempt and surface as a bounded
    failure — never wedge the executor thread."""
    import time

    _FakeOpenAI.hang_next = [30.0]  # far beyond the timeout budget
    p = _provider(fake_server, timeout_s=0.5, max_retries=0)
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="failed after 1 attempts"):
        p.chat_batch(pd.Series(["will hang"]))
    assert time.perf_counter() - t0 < 5.0  # one timeout, not a 30 s hang


def test_chat_on_error_null_fails_only_the_hung_row(fake_server):
    """chat_on_error='null': the row whose request hung (timed out through
    its retries) becomes a NULL answer; the rest of the batch still gets
    real completions."""
    _FakeOpenAI.hang_next = [30.0]  # only the FIRST request hangs
    p = _provider(fake_server, timeout_s=0.5, max_retries=0,
                  chat_on_error="null", max_concurrency=1)
    out = p.chat_batch(pd.Series(["hung row", "good row"]))
    assert out.iloc[0] is None
    assert out.iloc[1] == "echo:good row"


def test_chat_on_error_rejects_unknown_policy(fake_server):
    with pytest.raises(ValueError, match="chat_on_error"):
        _provider(fake_server, chat_on_error="ignore")


def test_rerank_groups_by_question_and_realigns(fake_server):
    p = _provider(fake_server)
    qs = pd.Series(["q1", "q2", "q1", "q2"])
    ts = pd.Series(["aaa", "b", "ccccc", "dd"])
    out = p.rerank_batch(qs, ts)
    # scores align to each pair's own document, not request order
    assert list(out) == [3.0, 1.0, 5.0, 2.0]
    rerank_reqs = [r for r in _FakeOpenAI.requests if r["path"] == "/rerank"]
    # one request per DISTINCT question, carrying that question's docs
    assert len(rerank_reqs) == 2
    assert sorted(len(r["body"]["documents"]) for r in rerank_reqs) == [2, 2]
