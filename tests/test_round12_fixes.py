"""Round-12 ADVICE pins: the stash content-token hardening and the
per-key construction lock (ADVICE r11 #2/#3).

No SparkSession needed — session_stash only reads
``spark.sparkContext.applicationId`` from its first argument, so a
stub carries the tests.
"""

from __future__ import annotations

import os
import threading
import time

from wq_data_pipeline_spark.operators import stash


class _Ctx:
    applicationId = "test-app"


class _Spark:
    sparkContext = _Ctx()


def _write(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def test_content_token_sees_size_change_with_preserved_mtime(tmp_path):
    """A rewrite that keeps file names AND timestamps (the non-Spark
    copy-with-preserved-mtimes case from ADVICE r11) still changes the
    token, because st_size is part of the tuple."""
    d = tmp_path / "t.parquet"
    d.mkdir()
    f = d / "part-00000"
    _write(str(f), b"aaaa")
    st = os.stat(f)
    t1 = stash.content_token(str(d))
    _write(str(f), b"bbbbbbbb")  # different size
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns))  # mtime preserved
    t2 = stash.content_token(str(d))
    assert t1 != t2


def test_content_token_nanosecond_mtime(tmp_path):
    """Same-size same-name rewrites differing only at sub-second mtime
    granularity get distinct tokens (st_mtime_ns, not float mtime)."""
    d = tmp_path / "t.parquet"
    d.mkdir()
    f = d / "part-00000"
    _write(str(f), b"aaaa")
    os.utime(f, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_001))
    t1 = stash.content_token(str(d))
    os.utime(f, ns=(1_000_000_000_000_000_000, 1_000_000_000_000_000_002))
    t2 = stash.content_token(str(d))
    assert t1 != t2


def test_session_stash_single_build_under_concurrency(tmp_path, monkeypatch):
    """Two threads requesting the same not-yet-built key run the
    builder ONCE: the loser blocks on the winner's build lock and is
    served the stashed value (ADVICE r11 — no duplicate trainer work,
    no overwritten-and-leaked checkpoint frames).

    The stash dicts are monkeypatched to fresh ones: the stub 'test-app'
    id would otherwise evict every LIVE session's stashed trainers
    process-wide when this test runs mid-suite (r12 review)."""
    monkeypatch.setattr(stash, "_STASH", {})
    monkeypatch.setattr(stash, "_BUILD_LOCKS", {})
    d = tmp_path / "docs.parquet"
    d.mkdir()
    _write(str(d / "part-00000"), b"x")
    builds = []
    started = threading.Event()

    def build():
        builds.append(threading.get_ident())
        started.set()
        time.sleep(0.2)  # hold the build long enough for overlap
        return object()

    results = []

    def call():
        results.append(
            stash.session_stash(
                _Spark(), str(tmp_path), "docs", ("fam",), build
            )
        )

    t1 = threading.Thread(target=call)
    t2 = threading.Thread(target=call)
    t1.start()
    started.wait(5)  # ensure t2 arrives while t1 is mid-build
    t2.start()
    t1.join(10)
    t2.join(10)
    assert len(builds) == 1
    assert len(results) == 2 and results[0] is results[1]


def test_session_stash_fresh_token_wins_cross_token_race(
    tmp_path, monkeypatch
):
    """The build lock is keyed on the PREFIX, not the full key: a
    build against a stale content token and one against the fresh
    token serialize, so the stale build can never finish last and
    evict the fresh entry (r12 review). The stale entry is evicted,
    the fresh value is served without a rebuild."""
    monkeypatch.setattr(stash, "_STASH", {})
    monkeypatch.setattr(stash, "_BUILD_LOCKS", {})
    d = tmp_path / "docs.parquet"
    d.mkdir()
    f = d / "part-00000"
    _write(str(f), b"v1")
    builds = []
    in_build = threading.Event()

    def build_slow():
        builds.append("stale")
        in_build.set()
        time.sleep(0.3)
        return "stale-value"

    def call_stale():
        stash.session_stash(_Spark(), str(tmp_path), "docs", ("fam",), build_slow)

    t1 = threading.Thread(target=call_stale)
    t1.start()
    in_build.wait(5)
    # fixture rewritten while the stale build is mid-flight
    _write(str(f), b"v2-longer")
    got = []

    def call_fresh():
        got.append(
            stash.session_stash(
                _Spark(), str(tmp_path), "docs", ("fam",),
                lambda: builds.append("fresh") or "fresh-value",
            )
        )

    t2 = threading.Thread(target=call_fresh)
    t2.start()
    t1.join(10)
    t2.join(10)
    assert builds == ["stale", "fresh"]  # serialized, fresh ran second
    assert got == ["fresh-value"]
    # the surviving stash entry is the fresh one only
    assert [k[-1] for k in stash._STASH] == [
        stash.content_token(str(d))
    ]
    # and a third caller is served from the stash, no rebuild
    assert (
        stash.session_stash(
            _Spark(), str(tmp_path), "docs", ("fam",),
            lambda: builds.append("again"),
        )
        == "fresh-value"
    )
    assert "again" not in builds
