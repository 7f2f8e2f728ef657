"""Schedule/mask invariants that must hold for every configuration (the
golden tests pin one schedule; these sweep schedules, respacings, datasets)."""
import numpy as np
import pytest

from motionstyle.data.masks import get_inpainting_mask
from motionstyle.diffusion.schedule import make_schedule

RESPACINGS = ["", "ddim20", "ddim100", "ddim10"]


class TestScheduleInvariants:
    @pytest.mark.parametrize("name", ["cosine", "linear"])
    @pytest.mark.parametrize("respacing", RESPACINGS)
    def test_tables_consistent_with_betas_fp64(self, name, respacing):
        """Every derived table must match an fp64 reconstruction from the
        schedule's own betas (gaussian_diffusion.py:182-219 algebra must
        survive the respaced beta rebuild)."""
        sched = make_schedule(name, 1000, respacing or None)
        betas = np.asarray(sched.betas, dtype=np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.concatenate([[1.0], ac[:-1]])
        assert (np.diff(ac) < 0).all() and (ac > 0).all() and (ac < 1).all()

        close = lambda a, b, **k: np.testing.assert_allclose(
            np.asarray(a, np.float64), b, rtol=3e-5, atol=1e-6, **k)
        close(sched.alphas_cumprod, ac)
        close(sched.alphas_cumprod_prev, ac_prev)
        close(sched.sqrt_alphas_cumprod, np.sqrt(ac))
        close(sched.sqrt_one_minus_alphas_cumprod, np.sqrt(1 - ac))
        close(sched.sqrt_recip_alphas_cumprod, np.sqrt(1.0 / ac))
        close(sched.sqrt_recipm1_alphas_cumprod, np.sqrt(1.0 / ac - 1.0))
        close(sched.posterior_variance, betas * (1 - ac_prev) / (1 - ac))
        close(sched.posterior_mean_coef1, betas * np.sqrt(ac_prev) / (1 - ac))
        close(sched.posterior_mean_coef2,
              (1 - ac_prev) * np.sqrt(alphas) / (1 - ac))

    @pytest.mark.parametrize("respacing", ["ddim20", "ddim100"])
    def test_timestep_map_is_strictly_increasing_subset(self, respacing):
        sched = make_schedule("cosine", 1000, respacing)
        tm = np.asarray(sched.timestep_map)
        assert (np.diff(tm) > 0).all()
        assert tm.min() >= 0 and tm.max() < 1000
        assert len(tm) == sched.num_timesteps


DATASETS = ["stylexia_posrot", "bandai-2_posrot", "humanml_posrot", "humanml"]


class TestMaskInvariants:
    @pytest.mark.parametrize("dataset", DATASETS)
    def test_masks_binary_and_nested(self, dataset):
        """Masks are {0,1}; root ⊆ root_horizontal's channel superset rules
        hold per layout (root keeps strictly more than y_rotation alone)."""
        C = {"stylexia_posrot": 181, "bandai-2_posrot": 190,
             "humanml_posrot": 199, "humanml": 263}[dataset]
        shape = (2, C, 1, 8)
        masks = {name: get_inpainting_mask(name, shape, dataset=dataset)
                 for name in ["root", "root_horizontal", "y_rotation",
                              "upper_body", "lower_body"]}
        for name, m in masks.items():
            assert set(np.unique(m)).issubset({0.0, 1.0}), name
            assert m.shape == shape, name
        # y_rotation keeps a subset of what root keeps
        assert (masks["y_rotation"] <= masks["root"] + 1e-9).all()
        # upper and lower body partition cannot both keep the same joint chans
        overlap = masks["upper_body"] * masks["lower_body"]
        # (root channels may be shared; joint channels must not fully overlap)
        assert overlap.sum() < masks["upper_body"].sum()
