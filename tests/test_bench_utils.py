"""Unit tests for bench.py's measurement-integrity helpers (VERDICT r4
item 1: plausibility bands, contamination detection, drift reporting —
pure host-side functions, no chip required)."""

import json

import bench


def test_plausible_covers_every_reported_config():
    names = {c[0] for c in bench.ENCODE_CONFIGS}
    names |= {"train_p16_fp32adam_mb64_remat", "train_rec19k_int8enc_mb64"}
    missing = names - set(bench.PLAUSIBLE)
    assert not missing, f"configs without a plausibility band: {missing}"
    for name, (lo, hi) in bench.PLAUSIBLE.items():
        assert 0 < lo < hi, (name, lo, hi)


def test_sanity_flags_out_of_band_readings(capsys):
    lo, hi = bench.PLAUSIBLE["encode_p64_int8_b128"]
    fails = bench._sanity({
        "encode_p64_int8_b128": (lo + hi) / 2,   # in band
        "encode_p16_bf16_b128": bench.PLAUSIBLE["encode_p16_bf16_b128"][1] * 2,
        "train_p16_mfu": 0.59,                   # no band -> ignored
    })
    assert set(fails) == {"encode_p16_bf16_b128"}
    assert "SANITY FAIL" in capsys.readouterr().out


def test_sanity_catches_r4_contaminated_artifact():
    """The exact r4 readings that shipped unflagged (VERDICT r4 weak #1)
    must now trip the bands: -52% p64 under contention and an impossible
    +43% p16 bf16."""
    fails = bench._sanity({"encode_p64_int8_b128": 2691.6,
                           "encode_p16_bf16_b128": 2207.8})
    assert set(fails) == {"encode_p64_int8_b128", "encode_p16_bf16_b128"}


def test_drift_vs_prior_artifact(tmp_path):
    ref = tmp_path / "BENCH_ref.json"
    ref.write_text(json.dumps({"detail": {"a": 100.0, "b": 200.0, "z": 0.0}}))
    drift = bench._drift_vs({"a": 110.0, "b": 190.0, "c": 5.0, "z": 3.0},
                            str(ref))
    assert drift == {"a": 10.0, "b": -5.0}  # zero/missing refs skipped
    assert bench._drift_vs({"a": 1.0}, str(tmp_path / "nope.json")) == {}


def test_detect_contention_returns_descriptions():
    hits = bench.detect_contention()
    assert isinstance(hits, list)
    assert all(isinstance(h, str) for h in hits)
    # this pytest process and its ancestors must never self-match
    import os
    assert not any(f"pid {os.getpid()}:" in h for h in hits)
