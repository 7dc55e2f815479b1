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


def test_session_stash_single_build_under_concurrency(tmp_path):
    """Two threads requesting the same not-yet-built key run the
    builder ONCE: the loser blocks on the winner's per-key lock and is
    served the stashed value (ADVICE r11 — no duplicate trainer work,
    no overwritten-and-leaked checkpoint frames)."""
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
