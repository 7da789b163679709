"""Adaptive (b, r) banding selection (config.choose_banding).

Round-7: the fixed 32x8 default bought direct-edge recall 1.0 at
candidate precision 0.41 (round-5 sweep, BENCH/BASELINE.md) — 2.5x the
verify work of a tighter choice at the same >=0.99 p_hit floor. The
chooser minimizes expected background-candidate volume subject to
p_hit(tau) >= target, so a tau change retunes banding instead of
silently reusing an 0.8-tuned shape (the round-5 16x16 bug class).
"""

from __future__ import annotations

import pytest

from mashing_pumpkins_spark.config import (
    PipelineConfig,
    banding_p_hit,
    choose_banding,
)


# the choice is pure arithmetic — pin it so a silent drift in the cost
# model shows up as a test failure, not a changed checkpoint hash
PINNED = {0.7: (37, 6), 0.8: (26, 8), 0.9: (18, 14)}


@pytest.mark.parametrize("tau,expected", sorted(PINNED.items()))
def test_choice_pinned(tau, expected):
    assert choose_banding(tau) == expected


@pytest.mark.parametrize("tau", sorted(PINNED))
def test_choice_meets_recall_floor(tau):
    b, r = choose_banding(tau)
    assert banding_p_hit(tau, b, r) >= 0.99
    assert b * r <= 256  # the band_input_k component budget


def test_choice_beats_fixed_32x8_verify_cost_at_tau_08():
    b, r = choose_banding(0.8)
    # same S-curve row width -> candidate volume scales with b alone
    assert r == 8 and b < 32


def test_minimality_no_cheaper_feasible_neighbor():
    # dropping one band from any pinned choice must break the p_hit floor
    # (b is the minimal feasible count at its r)
    for tau, (b, r) in PINNED.items():
        assert banding_p_hit(tau, b - 1, r) < 0.99


def test_default_config_is_adaptive():
    cfg = PipelineConfig()
    assert (cfg.n_bands, cfg.rows_per_band) == PINNED[0.8]
    cfg7 = PipelineConfig(jaccard_threshold=0.7)
    assert (cfg7.n_bands, cfg7.rows_per_band) == PINNED[0.7]


def test_explicit_banding_still_pins_exactly():
    cfg = PipelineConfig(n_bands=32, rows_per_band=8)
    assert (cfg.n_bands, cfg.rows_per_band) == (32, 8)
    # resolved adaptive ints feed config_hash like explicit ones: the
    # same shape written explicitly hashes identically
    assert (
        PipelineConfig(n_bands=26, rows_per_band=8).config_hash()
        == PipelineConfig().config_hash()
    )
    assert cfg.config_hash() != PipelineConfig().config_hash()


def test_half_set_banding_rejected():
    with pytest.raises(ValueError, match="together"):
        PipelineConfig(n_bands=32)
    with pytest.raises(ValueError, match="together"):
        PipelineConfig(rows_per_band=8)


def test_component_budget_respected():
    b, r = choose_banding(0.8, max_components=64)
    assert b * r <= 64
    assert banding_p_hit(0.8, b, r) >= 0.99


def test_infeasible_budget_raises():
    # r=1 already needs 3 bands at tau=0.8 (1-0.2^2 = 0.96 < 0.99), so a
    # 2-component budget admits nothing
    with pytest.raises(ValueError, match="no \\(bands, rows\\)"):
        choose_banding(0.8, max_components=2)


def test_validation():
    with pytest.raises(ValueError):
        choose_banding(0.0)
    with pytest.raises(ValueError):
        choose_banding(0.8, p_hit_target=1.0)
    with pytest.raises(ValueError):
        choose_banding(0.8, bg_jaccard=0.9)


def test_tau_one_degenerates_to_single_band():
    b, r = choose_banding(1.0)
    assert b == 1
