"""RTT-probe cache semantics (runner._device_rtt_ms).

VERDICT round-3 weak #8: a tunnel that recovers mid-run must be
re-probed. Policy under test:

* fast probes (<= 20 ms, the routing threshold) are cached forever;
* an unreachable device that switched the process to CPU is final
  (no in-process recovery is possible once backends initialized);
* a slow-but-alive probe expires after WFMASH_TPU_RTT_TTL_S.
"""

import wfmash_tpu.runner as runner


def _set(ms, ts, final):
    runner._RTT_MS = ms
    runner._RTT_TS = ts
    runner._RTT_FINAL = final


def _restore(orig):
    runner._RTT_MS, runner._RTT_TS, runner._RTT_FINAL = orig


def test_fast_probe_cached_forever(monkeypatch):
    orig = (runner._RTT_MS, runner._RTT_TS, runner._RTT_FINAL)
    try:
        _set(0.5, -1e9, False)   # ancient timestamp, but fast
        assert runner._device_rtt_ms() == 0.5
    finally:
        _restore(orig)


def test_unreachable_is_final(monkeypatch):
    orig = (runner._RTT_MS, runner._RTT_TS, runner._RTT_FINAL)
    try:
        _set(float("inf"), -1e9, True)
        assert runner._device_rtt_ms() == float("inf")
    finally:
        _restore(orig)


def test_slow_probe_expires(monkeypatch):
    import time

    orig = (runner._RTT_MS, runner._RTT_TS, runner._RTT_FINAL)
    try:
        # fresh slow probe: served from cache
        _set(250.0, time.monotonic(), False)
        assert runner._device_rtt_ms() == 250.0
        # expired slow probe: re-probed (CPU backend in tests -> the
        # in-process probe path, which is fast and marks itself final)
        monkeypatch.setenv("WFMASH_TPU_RTT_TTL_S", "0")
        fresh = runner._device_rtt_ms()
        assert fresh != 250.0
        assert runner._RTT_FINAL
    finally:
        _restore(orig)
