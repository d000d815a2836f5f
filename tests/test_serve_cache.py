"""Per-worker decoded-table cache of the direct serving path: fingerprint
invalidation, LRU byte-budget eviction, and the disable switch. Pure
Python/pyarrow — no SparkSession (the cache lives inside executor worker
processes; end-to-end identity is covered by tests/test_searcher.py)."""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from quickb_spark.query import serve_direct as sd


def _seg_file(path, n_rows, seed):
    rng = np.random.default_rng(seed)
    n_blocks = 1
    tbl = pa.table(
        {
            "term_h": pa.array(
                rng.integers(-(2**60), 2**60, n_rows), type=pa.int64()
            ),
            "df_part": pa.array(np.full(n_rows, 1), type=pa.int64()),
            "doc_stream": pa.array([rng.bytes(64)] * n_rows, type=pa.binary()),
            "tf_stream": pa.array([b"\x01"] * n_rows, type=pa.binary()),
            "dl_stream": pa.array([b"\x03"] * n_rows, type=pa.binary()),
            "block_last_doc": pa.array([[2**62]] * n_rows, type=pa.list_(pa.int64())),
            "block_doc_off": pa.array([[0]] * n_rows, type=pa.list_(pa.int64())),
            "block_tf_off": pa.array([[0] * n_blocks] * n_rows, type=pa.list_(pa.int64())),
            "block_dl_off": pa.array([[0]] * n_rows, type=pa.list_(pa.int64())),
        }
    )
    pq.write_table(tbl, str(path))
    return tbl


@pytest.fixture(autouse=True)
def _fresh_cache(monkeypatch):
    # isolate from the host-shared decoded cache (/dev/shm default): the
    # LRU tests below assert decode/identity behavior of the in-process
    # tier alone; the shm tier has its own tests further down
    monkeypatch.setenv("QKB_SERVE_SHM_DIR", "")
    sd._TBL_CACHE.clear()
    sd._TBL_CACHE_BYTES[0] = 0
    yield
    sd._TBL_CACHE.clear()
    sd._TBL_CACHE_BYTES[0] = 0


def test_cache_hit_and_fingerprint_invalidation(tmp_path, monkeypatch):
    monkeypatch.setenv("QKB_SERVE_CACHE_MB", "64")
    p = tmp_path / "seg.parquet"
    _seg_file(p, 50, seed=1)
    a = sd._cached_table(str(p), want_pos=False)
    assert sd._cached_table(str(p), want_pos=False) is a  # cache hit
    assert len(sd._TBL_CACHE) == 1
    # replace the file (rebuild): same path, new content -> new fingerprint
    time.sleep(0.01)
    _seg_file(p, 70, seed=2)
    os.utime(p)  # ensure mtime moves even on coarse-clock filesystems
    b = sd._cached_table(str(p), want_pos=False)
    assert b is not a and b.num_rows == 70
    assert len(sd._TBL_CACHE) == 1  # stale entry replaced, not leaked


def test_cache_lru_eviction_respects_budget(tmp_path, monkeypatch):
    monkeypatch.setenv("QKB_SERVE_CACHE_MB", "1")  # 1 MiB budget
    paths = []
    for i in range(6):
        p = tmp_path / f"seg{i}.parquet"
        _seg_file(p, 2000, seed=i)  # ~150KB+ of stream bytes each
        paths.append(str(p))
    for p in paths:
        sd._cached_table(p, want_pos=False)
    assert sd._TBL_CACHE_BYTES[0] <= 1 << 20
    assert 0 < len(sd._TBL_CACHE) < 6  # something cached, something evicted
    # most-recently-used entry survived; the oldest went first
    assert (paths[-1], False) in sd._TBL_CACHE
    assert (paths[0], False) not in sd._TBL_CACHE


def test_cache_disable_reads_fresh(tmp_path, monkeypatch):
    monkeypatch.setenv("QKB_SERVE_CACHE_MB", "0")
    p = tmp_path / "seg.parquet"
    _seg_file(p, 10, seed=3)
    a = sd._cached_table(str(p), want_pos=False)
    b = sd._cached_table(str(p), want_pos=False)
    assert a is not b and not sd._TBL_CACHE and sd._TBL_CACHE_BYTES[0] == 0


# --------------------------------------------------------------------------
# host-shared decoded-table cache (Arrow IPC in /dev/shm — the per-host
# segment cache that makes the server open's decode once-per-HOST instead
# of once-per-worker-process)
# --------------------------------------------------------------------------


def test_shm_publish_and_mmap_read(tmp_path, monkeypatch):
    shm = tmp_path / "shm"
    monkeypatch.setenv("QKB_SERVE_SHM_DIR", str(shm))
    p = tmp_path / "seg.parquet"
    want = _seg_file(p, 80, seed=5)
    a = sd._cached_table(str(p), want_pos=False)
    published = list(shm.glob("*.arrow"))
    assert len(published) == 1  # decoded form published for peers
    # simulate a DIFFERENT worker process: fresh LRU, parquet decode
    # forbidden — the table must come back via the shm mmap alone
    sd._TBL_CACHE.clear()
    sd._TBL_CACHE_BYTES[0] = 0
    import pyarrow.parquet as _pq

    def _boom(*a, **k):
        raise AssertionError("peer worker must not re-decode parquet")

    monkeypatch.setattr(_pq, "read_table", _boom)
    b = sd._cached_table(str(p), want_pos=False)
    assert b.equals(a)
    assert b.num_rows == want.num_rows


def test_shm_fingerprint_never_serves_stale(tmp_path, monkeypatch):
    shm = tmp_path / "shm"
    monkeypatch.setenv("QKB_SERVE_SHM_DIR", str(shm))
    p = tmp_path / "seg.parquet"
    _seg_file(p, 30, seed=6)
    sd._cached_table(str(p), want_pos=False)
    # rebuild: same path, new content — the shm key includes (size,
    # mtime), so the stale entry can never match
    time.sleep(0.01)
    _seg_file(p, 45, seed=7)
    os.utime(p)
    sd._TBL_CACHE.clear()
    sd._TBL_CACHE_BYTES[0] = 0
    b = sd._cached_table(str(p), want_pos=False)
    assert b.num_rows == 45


def test_shm_eviction_bounds_dir(tmp_path, monkeypatch):
    shm = tmp_path / "shm"
    monkeypatch.setenv("QKB_SERVE_SHM_DIR", str(shm))
    monkeypatch.setenv("QKB_SERVE_SHM_MB", "1")
    for i in range(8):
        p = tmp_path / f"seg{i}.parquet"
        _seg_file(p, 2000, seed=10 + i)
        sd._cached_table(str(p), want_pos=False)
    total = sum(f.stat().st_size for f in shm.glob("*.arrow"))
    assert total <= 1 << 20
    assert list(shm.glob("*.arrow"))  # newest survives


def test_shm_disabled_publishes_nothing(tmp_path, monkeypatch):
    monkeypatch.setenv("QKB_SERVE_SHM_DIR", "")
    p = tmp_path / "seg.parquet"
    _seg_file(p, 10, seed=9)
    sd._cached_table(str(p), want_pos=False)
    assert sd._shm_dir() is None
