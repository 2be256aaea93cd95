"""bench.py kernel-gate adoption: the opt-in Pallas kernels must only be
enabled from a recorded hardware-validation PASS, never by default (the
round-2 lesson: a kernel the real chip has not compiled must not be on the
production path). Pure host logic — no TPU needed."""

import importlib
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


def _bench():
    import bench

    return importlib.reload(bench)


def _clean_env():
    keys = ("RPE_PALLAS_5PT", "RPE_PALLAS_EXTRACT", "RPE_PALLAS_MATCH",
            "RPE_EXTRACT_T", "RPE_EXTRACT_T_BRIEF")
    return mock.patch.dict(os.environ, {}, clear=False), keys


def test_no_log_no_gates(tmp_path):
    bench = _bench()
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG",
                               str(tmp_path / "absent.log")):
            assert bench._enable_validated_kernels() is False
        assert not any(os.environ.get(k) for k in keys)


def test_pass_enables_gates_but_not_tbrief(tmp_path):
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("... extract-T-BRIEF FAILED (non-fatal): ...\n"
                   "VALIDATION PASS\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is True
        for k in keys[:-1]:
            assert os.environ.get(k) == "1", k
        # the separately-fenced kernel must NOT ride the main marker
        assert os.environ.get("RPE_EXTRACT_T_BRIEF") is None


def test_tbrief_marker_never_adopted(tmp_path):
    """T_BRIEF's kernel PASS alone must enable nothing: single-image
    bit-parity doesn't clear its Mosaic-transcendental ULP risk. Adoption
    requires the dataset-level "T_BRIEF3 CSV-AB PASS" marker (appended by
    the regen flow when the simulator CSV is bit-identical to the T
    path's) — which must then enable it."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("T_BRIEF3 PASS\nVALIDATION PASS\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is True
        assert os.environ.get("RPE_EXTRACT_T_BRIEF") is None


def test_tbrief_csv_ab_marker_adopts(tmp_path):
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("T_BRIEF3 PASS\nT_BRIEF3 CSV-AB PASS\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is True
        assert os.environ.get("RPE_EXTRACT_T_BRIEF") == "1"


def test_operator_choice_wins(tmp_path):
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("T_BRIEF PASS\nVALIDATION PASS\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        os.environ["RPE_EXTRACT_T"] = ""  # explicit off
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is False
        assert os.environ.get("RPE_PALLAS_5PT") is None


def test_tbrief_alone_enables_nothing(tmp_path):
    """T_BRIEF rides on the T kernel: its marker without EXTRACT_T (or the
    full PASS) must enable nothing."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("drive: ok=True ...\n5pt compile+run 120s\n"
                   "T_BRIEF PASS\n")  # crashed before any other marker
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is False
        assert not any(os.environ.get(k) for k in keys)


def test_partial_markers_enable_exact_subset(tmp_path):
    """v2 per-section markers: a validation run cut short adopts exactly
    the kernels whose sections passed (late-recovery resilience)."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("5PT PASS  [812s]\n"
                   "DETECT_BASE PASS  [400s]\n"
                   "EXTRACT FAILED (non-fatal): Mosaic ...\n"
                   "MATCH PASS  [301s]\n"
                   "VALIDATION PARTIAL: {'5PT': True, 'EXTRACT': False}\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is True
        assert os.environ.get("RPE_PALLAS_5PT") == "1"
        assert os.environ.get("RPE_PALLAS_MATCH") == "1"
        assert os.environ.get("RPE_PALLAS_EXTRACT") is None
        assert os.environ.get("RPE_EXTRACT_T") is None
        assert os.environ.get("RPE_EXTRACT_T_BRIEF") is None


def test_extract_t_marker_does_not_leak_into_extract(tmp_path):
    """Substring safety: 'EXTRACT_T3 PASS' must not read as 'EXTRACT PASS'."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("EXTRACT_T3 PASS  [500s]\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is True
        assert os.environ.get("RPE_EXTRACT_T") == "1"
        assert os.environ.get("RPE_PALLAS_EXTRACT") is None


def test_stale_vacuous_extract_t_marker_ignored(tmp_path):
    """The retired 'EXTRACT_T PASS' marker (recorded 08-18 by a run where
    the dispatch no-op'd RPE_EXTRACT_T and the section compared the XLA
    path against itself) must never enable the now-meaningful gate."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("EXTRACT_T PASS  [200s]\nT_BRIEF PASS  [34s]\n")
    patch, keys = _clean_env()
    with patch:
        for k in keys:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._enable_validated_kernels() is False
        assert not any(os.environ.get(k) for k in keys)


def test_wait_respects_chain_lock(tmp_path):
    """While the recovery chain holds the TPU lock, bench must not probe
    (a concurrent jax.devices() can wedge the chain's session) and must
    time out with a machine-readable chain reason."""
    bench = _bench()
    lock = tmp_path / "rpe_chain_running"
    lock.write_text("")
    probes = []
    with mock.patch.object(bench, "_CHAIN_LOCK", str(lock)), \
         mock.patch.object(bench, "_probe_backend_subprocess",
                           lambda *a, **k: probes.append(1) or True), \
         mock.patch.dict(os.environ, {"RPE_BENCH_WAIT_S": "0.1"}):
        ok, reason = bench._wait_for_backend()
    assert ok is False
    assert "recovery-chain" in reason
    assert probes == []  # never probed while locked


def test_wait_probes_after_lock_clears(tmp_path):
    bench = _bench()
    with mock.patch.object(bench, "_CHAIN_LOCK",
                           str(tmp_path / "absent")), \
         mock.patch.object(bench, "_probe_backend_subprocess",
                           lambda *a, **k: True), \
         mock.patch.dict(os.environ, {"RPE_BENCH_WAIT_S": "5"}):
        ok, reason = bench._wait_for_backend()
    assert ok is True


def test_cached_auto_result_adopted(tmp_path):
    """When the backend is unreachable, the recovery chain's own bench
    measurement (same code, same chip) is emitted with provenance instead
    of a null."""
    bench = _bench()
    auto = tmp_path / "bench_r3_auto.json"
    auto.write_text('{"metric": "m", "value": 123.4, "unit": "pairs/s", '
                    '"vs_baseline": 40.0}\n')
    with mock.patch.object(bench, "_AUTO_BENCH", str(auto)):
        rec = bench._cached_auto_result()
    assert rec is not None
    assert rec["value"] == 123.4
    assert "cached" in rec["note"]
    assert "measured_at" in rec


def test_cached_auto_result_rejects_null_and_garbage(tmp_path):
    bench = _bench()
    auto = tmp_path / "bench_r3_auto.json"
    auto.write_text('{"metric": "m", "value": null, "reason": "wedged"}\n')
    with mock.patch.object(bench, "_AUTO_BENCH", str(auto)):
        assert bench._cached_auto_result() is None
    auto.write_text("Traceback (most recent call last):\n  boom\n")
    with mock.patch.object(bench, "_AUTO_BENCH", str(auto)):
        assert bench._cached_auto_result() is None
    with mock.patch.object(bench, "_AUTO_BENCH",
                           str(tmp_path / "absent.json")):
        assert bench._cached_auto_result() is None


def test_stale_chain_lock_ignored(tmp_path):
    bench = _bench()
    lock = tmp_path / "rpe_chain_running"
    lock.write_text("")
    old = 7 * 3600
    os.utime(lock, (os.path.getmtime(lock) - old,
                    os.path.getmtime(lock) - old))
    with mock.patch.object(bench, "_CHAIN_LOCK", str(lock)), \
         mock.patch.object(bench, "_probe_backend_subprocess",
                           lambda *a, **k: True), \
         mock.patch.dict(os.environ, {"RPE_BENCH_WAIT_S": "5"}):
        ok, _ = bench._wait_for_backend()
    assert ok is True
