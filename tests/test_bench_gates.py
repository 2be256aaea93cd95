"""Kernel-gate semantics after the 08-18 hardware validation.

The validated Pallas kernel families are ON by default in the library
(rpe_tpu.ops.fast.kernel_gate) whenever the backend is TPU; env vars are
the opt-out. bench.py keeps only the PROTECTIVE direction: a hardware
validation log on this host that records a family FAILURE forces that
family back to the XLA path before measuring. Pure host logic — no TPU
needed."""

import importlib
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

GATE_KEYS = ("RPE_PALLAS_5PT", "RPE_PALLAS_EXTRACT", "RPE_PALLAS_MATCH",
             "RPE_EXTRACT_T", "RPE_EXTRACT_T_BRIEF")


def _bench():
    import bench

    return importlib.reload(bench)


def _clean_env():
    return mock.patch.dict(os.environ, {}, clear=False)


# ---------------------------------------------------------------- library

def test_kernel_gate_defaults_on_for_validated_set():
    from rpe_tpu.ops.fast import _VALIDATED_KERNEL_GATES, kernel_gate

    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        for k in GATE_KEYS:
            assert k in _VALIDATED_KERNEL_GATES
            assert kernel_gate(k) is True, k
        # non-validated names stay opt-in
        assert kernel_gate("RPE_SOME_FUTURE_KERNEL") is False


def test_kernel_gate_env_off_values():
    from rpe_tpu.ops.fast import kernel_gate

    with _clean_env():
        for v in ("", "0", "off", "OFF", "false", "no"):
            os.environ["RPE_PALLAS_5PT"] = v
            assert kernel_gate("RPE_PALLAS_5PT") is False, repr(v)
        for v in ("1", "on", "yes", "anything"):
            os.environ["RPE_PALLAS_5PT"] = v
            assert kernel_gate("RPE_PALLAS_5PT") is True, repr(v)
        os.environ.pop("RPE_PALLAS_5PT", None)


def test_kernel_gate_env_on_enables_non_default():
    from rpe_tpu.ops.fast import kernel_gate

    with _clean_env():
        os.environ["RPE_SOME_FUTURE_KERNEL"] = "1"
        assert kernel_gate("RPE_SOME_FUTURE_KERNEL") is True
        os.environ.pop("RPE_SOME_FUTURE_KERNEL", None)


# ---------------------------------------------------------------- bench.py

def test_no_log_changes_nothing(tmp_path):
    bench = _bench()
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG",
                               str(tmp_path / "absent.log")):
            assert bench._disable_failed_kernels() == []
        assert not any(os.environ.get(k) for k in GATE_KEYS)


def test_all_pass_log_changes_nothing(tmp_path):
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("5PT PASS  [812s]\nEXTRACT PASS  [400s]\n"
                   "EXTRACT_T3 PASS  [500s]\nMATCH PASS  [301s]\n"
                   "T_BRIEF3 PASS  [34s]\nT_BRIEF3 CSV-AB PASS\n"
                   "VALIDATION PASS\n")
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._disable_failed_kernels() == []
        assert all(os.environ.get(k) is None for k in GATE_KEYS)


def test_failed_family_disabled(tmp_path):
    """A section failure recorded by the validation decorator forces that
    family (and only that family) back to the XLA path."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("5PT PASS  [812s]\n"
                   "EXTRACT FAILED (non-fatal): Mosaic layout ...\n"
                   "MATCH PASS  [301s]\n")
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._disable_failed_kernels() == ["RPE_PALLAS_EXTRACT"]
        assert os.environ.get("RPE_PALLAS_EXTRACT") == "0"
        assert os.environ.get("RPE_PALLAS_5PT") is None
        assert os.environ.get("RPE_PALLAS_MATCH") is None


def test_tbrief_csv_ab_failure_disables_tbrief(tmp_path):
    """The dataset-level CSV A/B can fail even when the kernel's
    single-image bit-parity passed (Mosaic transcendental ULPs on a
    round() boundary) — it must disable RPE_EXTRACT_T_BRIEF."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("T_BRIEF3 PASS  [34s]\nT_BRIEF3 CSV-AB FAIL: 3 rows\n")
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._disable_failed_kernels() == ["RPE_EXTRACT_T_BRIEF"]
        assert os.environ.get("RPE_EXTRACT_T_BRIEF") == "0"
        assert os.environ.get("RPE_EXTRACT_T") is None


def test_operator_choice_wins_over_failure_log(tmp_path):
    """An operator who explicitly set a gate keeps their choice even when
    the log recorded a failure for that family."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("MATCH FAILED (non-fatal): ...\n")
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        os.environ["RPE_PALLAS_MATCH"] = "1"  # explicit operator choice
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._disable_failed_kernels() == []
        assert os.environ.get("RPE_PALLAS_MATCH") == "1"


def test_extract_t3_failure_does_not_leak_into_extract(tmp_path):
    """Substring safety: 'EXTRACT_T3 FAILED' must not read as
    'EXTRACT FAILED' (marker strings are checked verbatim)."""
    bench = _bench()
    log = tmp_path / "v.log"
    log.write_text("EXTRACT_T3 FAILED (non-fatal): ...\n")
    with _clean_env():
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        with mock.patch.object(bench, "_VALIDATE_LOG", str(log)):
            assert bench._disable_failed_kernels() == ["RPE_EXTRACT_T"]
        assert os.environ.get("RPE_EXTRACT_T") == "0"
        assert os.environ.get("RPE_PALLAS_EXTRACT") is None
