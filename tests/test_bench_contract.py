"""bench.py contract tests (VERDICT r2 weak #4 / next #6): the MFU
denominator is gated on an architecture fingerprint — any architecture
change must make bench.py refuse the pinned flops constant instead of
reporting a silently stale MFU."""

import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_pinned_hash_matches_current_default_arch():
    cfg = bench._eval_cfg(check_backend=False)
    assert bench._arch_hash(cfg) == bench.EVAL_ARCH_HASH, (
        "architecture changed without re-pinning EVAL_ARCH_HASH / "
        "EVAL_FWD_FLOPS_* — run `python bench.py --arch-hash` and "
        "re-measure the flops pins")


def test_arch_change_flips_hash():
    cfg = bench._eval_cfg(check_backend=False)
    for change in ({"dense_trans_dim": 256}, {"enc_layers": 4},
                   {"eval_hw": (512, 1024)}, {"decoder_blockconv": False}):
        assert bench._arch_hash(cfg.replace(**change)) != \
            bench.EVAL_ARCH_HASH, change


def test_use_pallas_not_in_fingerprint():
    # both paths compute identical convolutions; the pin was measured on
    # the pure-XLA path and must stay valid for the Pallas serving path
    cfg = bench._eval_cfg(check_backend=False)
    assert bench._arch_hash(cfg.replace(use_pallas=True)) == \
        bench._arch_hash(cfg)


def test_resolve_refuses_stale_pin(monkeypatch):
    # simulate an architecture drift: hash mismatch must yield flops=None
    # (no MFU) plus the fresh CPU figure, never the stale pinned constant
    monkeypatch.setattr(bench, "EVAL_ARCH_HASH", "0" * 16)
    monkeypatch.setattr(bench, "_fresh_cpu_flops", lambda: 1.5e12)
    flops, extra = bench.resolve_eval_flops()
    assert flops is None
    assert extra["mfu_stale_pin"] is True
    assert extra["eval_fwd_flops_cpu_fresh"] == 1.5e12


def test_resolve_uses_pin_on_match(monkeypatch):
    monkeypatch.setattr(
        bench, "_fresh_cpu_flops",
        lambda: (_ for _ in ()).throw(AssertionError("must not recompute")))
    flops, extra = bench.resolve_eval_flops()
    assert flops == bench.EVAL_FWD_FLOPS_TPU
    assert extra == {}


def test_tunnel_health_fields(monkeypatch):
    """VERDICT r4 #4: a wedge-tainted headline must be self-identifying —
    _wait_for_tunnel returns probe count/latency, and flags degradation
    whenever recovery probes were needed."""
    monkeypatch.setattr(bench, "_probe_tunnel", lambda timeout_s=120.0: True)
    h = bench._wait_for_tunnel(budget_minutes=0.01)
    assert h["tunnel_probes"] == 1 and "tunnel_probe_secs" in h
    assert "tunnel_degraded" not in h

    calls = iter([False, True])
    monkeypatch.setattr(bench, "_probe_tunnel",
                        lambda timeout_s=120.0: next(calls))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    h = bench._wait_for_tunnel(budget_minutes=1.0)
    assert h["tunnel_probes"] == 2 and h["tunnel_degraded"] is True

    monkeypatch.setattr(bench, "_probe_tunnel", lambda timeout_s=120.0: False)
    assert bench._wait_for_tunnel(budget_minutes=0.0) is None
