"""Unit tests for the crawl-scaling estimator (bench.summarize_pairs).

The estimator is a pure function of recorded legs, so it is tested by
replaying runs — including the two measured failure modes it exists to
exclude: a throughput-band regime shift on the small leg (inflates the
pair) and a clock-regime mismatch between the legs (corrupts the ratio
in either direction; the 2026-08-19 4-core leg that probed 11.9k
against a 17-20k epoch burned 25% more CPU ticks for identical work
and read 0.74 where the clean leg read 0.93).

No Spark needed — pure python over dicts.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench


def mkpair(small, big, s_thr, b_thr, clock_ratio=1.0):
    return {
        "family": f"{small}to{big}",
        "small": small,
        "big": big,
        "small_thr": s_thr,
        "big_thr": b_thr,
        "clock_ratio": clock_ratio,
        "eff": round(b_thr / s_thr / (big / small), 3),
    }


def summarize(pairs, ceiling=50000.0, **kw):
    thr = {}
    for p in pairs:
        thr.setdefault(p["small"], []).append(p["small_thr"])
        thr.setdefault(p["big"], []).append(p["big_thr"])
    return bench.summarize_pairs(pairs, thr, ceiling, **kw)


def test_headline_is_median_of_usable_pairs():
    pairs = [
        mkpair(1, 4, 5500, 20400),  # 0.927
        mkpair(1, 4, 5450, 19000),  # 0.872
        mkpair(1, 4, 5600, 19500),  # 0.871
    ]
    out = summarize(pairs)
    assert out["scaling_efficiency"] == 0.872
    assert out["best_paired_efficiency"] == 0.927
    assert out["pairs_over_criterion"] == 3
    assert out["n_pairs_excluded_invalid"] == 0


def test_clock_mismatch_excludes_pair_both_directions():
    # replay of the measured 2026-08-19 case: big leg under a degraded
    # clock regime (ratio small/big = 17.5k/14.6k = 1.20) reads 0.741
    degraded_big = mkpair(1, 4, 5582, 16542, clock_ratio=1.20)
    clean = mkpair(1, 4, 5468, 20378, clock_ratio=0.97)
    out = summarize([degraded_big, clean])
    assert out["n_pairs_excluded_clock_mismatch"] == 1
    assert not out["pairs"][0]["valid"]
    assert out["scaling_efficiency"] == 0.932  # the clean pair only
    # the mirror image — a degraded SMALL leg inflates; same gate
    # (a second clean pair anchors the level median, as a real 3-rep
    # run does)
    degraded_small = mkpair(1, 4, 5400, 24000, clock_ratio=0.80)
    clean2 = mkpair(1, 4, 5510, 20100, clock_ratio=1.01)
    out2 = summarize([degraded_small, clean, clean2])
    assert out2["n_pairs_excluded_clock_mismatch"] == 1
    assert not out2["pairs"][0]["valid"]
    assert out2["scaling_efficiency"] == round((0.932 + 0.912) / 2, 3)


def test_small_leg_band_is_symmetric():
    # three clean pairs + one whose small leg is 15% BELOW the level
    # median (steal-degraded -> inflated eff): excluded
    pairs = [
        mkpair(1, 4, 5500, 19000),
        mkpair(1, 4, 5450, 19200),
        mkpair(1, 4, 5550, 19100),
        mkpair(1, 4, 4650, 19000),  # inflated 1.021
    ]
    out = summarize(pairs)
    assert not out["pairs"][3]["valid"]
    assert out["pairs"][3]["eff"] > 1.0
    # ... and one 15% ABOVE the median (clock-lucky -> deflated): the
    # round-2 one-sided band kept these; the symmetric band excludes
    pairs2 = [
        mkpair(1, 4, 5500, 19000),
        mkpair(1, 4, 5450, 19200),
        mkpair(1, 4, 5550, 19100),
        mkpair(1, 4, 6400, 19000),  # deflated 0.742
    ]
    out2 = summarize(pairs2)
    assert not out2["pairs"][3]["valid"]
    assert all(p["valid"] for p in out2["pairs"][:3])


def test_ceiling_bound_pairs_excluded_with_fallback():
    # 2->8 pair whose big leg rides the host ceiling: excluded from the
    # headline while the 1->4 family carries it
    p28 = mkpair(2, 8, 10024, 32844)  # eff 0.819, but 32844 >= 0.9*33000
    p14 = mkpair(1, 4, 5500, 20000)  # 0.909
    out = summarize([p28, p14], ceiling=33000.0)
    assert out["pairs"][0]["ceiling_bound"]
    assert out["n_pairs_host_ceiling_bound"] == 1
    assert out["scaling_efficiency"] == 0.909
    # every pair ceiling-bound -> fall back to the raw valid median
    # rather than reporting nothing
    out2 = summarize([p28], ceiling=33000.0)
    assert out2["scaling_efficiency"] == 0.819


def test_missing_clock_probe_is_not_penalized():
    p = mkpair(1, 4, 5500, 19800, clock_ratio=None)
    out = summarize([p])
    assert out["pairs"][0]["valid"]
    assert out["n_pairs_excluded_clock_mismatch"] == 0
    assert out["scaling_efficiency"] == 0.9


def test_per_family_and_ratio_of_medians_keys():
    pairs = [
        mkpair(2, 8, 10024, 32844),
        mkpair(1, 4, 5500, 20000),
        mkpair(1, 4, 5400, 19400),
    ]
    out = summarize(pairs, ceiling=50000.0)
    assert out["scaling_efficiency_2to8"] == 0.819
    assert 0.88 <= out["scaling_efficiency_1to4"] <= 0.91
    assert 0.80 <= out["ratio_of_medians_1to4"] <= 0.92


def test_superlinear_pair_excluded_with_ratio_of_maxes_fallback():
    # replay of the measured 2026-08-19 degraded epoch: every 1-core
    # leg ran slow (3.9/3.7/4.6k vs the 6.2k clean epoch), the median
    # band kept the two slowest and excluded the cleanest, and the
    # lone surviving pair read a physically-implausible 1.01
    pairs = [
        mkpair(2, 8, 10120, 25256),           # ceiling-bound at 26.8k
        mkpair(2, 8, 8702, 18329, 1.2),       # clock mismatch
        mkpair(1, 4, 3859, 15586),            # 1.01 -> suspect
        mkpair(1, 4, 3686, 10803, 1.25),      # clock mismatch
        mkpair(1, 4, 4571, 16005),            # cleanest leg; band-excluded
    ]
    out = summarize(pairs, ceiling=26804.0)
    assert out["pairs"][2]["superlinear_suspect"]
    assert out["n_pairs_excluded_superlinear"] == 1
    # no usable pair -> disclosed fallback to ratio of maxes of the
    # primary family: 16005 / 4571 / 4 = 0.875
    assert out["estimator_fallback"].startswith("ratio_of_maxes_1to4")
    assert out["scaling_efficiency"] == 0.875
    assert out["ratio_of_maxes_1to4"] == 0.875


def test_superlinear_guard_does_not_touch_clean_epochs():
    pairs = [
        mkpair(1, 4, 6290, 21375),  # 0.85 (the recorded sixth run)
        mkpair(1, 4, 6167, 21302),  # 0.864
        mkpair(2, 8, 11366, 35968),  # 0.791
    ]
    out = summarize(pairs, ceiling=45000.0)
    assert out["n_pairs_excluded_superlinear"] == 0
    assert "estimator_fallback" not in out
    assert out["scaling_efficiency"] == 0.85


def test_speedup_and_fallback_respect_superlinear_guard():
    # the suspect pair must not drive the speedup either
    pairs = [
        mkpair(1, 4, 3859, 15586),   # 1.01 -> suspect
        mkpair(1, 4, 4571, 16005, 1.2),  # clock-mismatched
    ]
    out = summarize(pairs, ceiling=50000.0)
    assert out["pairs"][0]["superlinear_suspect"]
    assert out["speedup"] is None  # no usable pair left
    # ratio_of_maxes fallback > 1.0 is the same artifact: fall through
    pairs2 = [
        mkpair(1, 4, 3000, 15000),   # 1.25 -> suspect
        mkpair(1, 4, 3100, 15100, 1.2),  # clock-mismatched (1.218)
    ]
    out2 = summarize(pairs2, ceiling=50000.0)
    assert out2["ratio_of_maxes_1to4"] > 1.0
    assert not out2["estimator_fallback"].startswith("ratio_of_maxes")
    # ... and the disclosure names the raw-median branch honestly
    assert out2["estimator_fallback"].startswith("raw median")


def test_estimator_used_field_discriminates_fallbacks():
    """BENCH JSON carries a top-level `estimator_used` tag: the median
    path and every fallback are distinguishable without parsing
    prose."""
    # clean epoch -> median path
    out = summarize([mkpair(1, 4, 1000, 3400), mkpair(1, 4, 1000, 3300)])
    assert out["estimator_used"] == "median_of_valid_pairs"
    assert "estimator_fallback" not in out
    # degraded epoch (no usable pair) -> fallback tag matches exactly
    out2 = summarize(
        [mkpair(1, 4, 3859, 15586), mkpair(1, 4, 4571, 16005)],
        small_leg_band=0.99,
    )
    assert out2["estimator_used"] == out2["estimator_fallback"]
