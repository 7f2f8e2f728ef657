"""The --dtype model flag: CLI resolution rules + bf16 compute numerics.

bf16 is the benchmarked TPU serving dtype (BASELINE.md headline runs
MDMConfig(dtype="bfloat16", fused=True)); until r3 it was reachable only by
constructing MDMConfig in code. These tests pin the CLI resolution contract:
float32 default, fused/quant_int8 imply bfloat16 (the fused kernel's designed
input), an explicit --dtype always wins, and args.json can never resurrect it
(run-local exclusion in parser_util.parse_and_load_from_model).
"""
from argparse import ArgumentParser, Namespace

import jax
import jax.numpy as jnp
import numpy as np

from motionstyle.cli.model_util import get_transfer_config
from motionstyle.cli.parser_util import add_model_options


def _args(**kw):
    base = dict(dataset="stylexia_posrot", latent_dim=32, layers=2,
                cond_mask_prob=0.1)
    base.update(kw)
    return Namespace(**base)


class TestDtypeResolution:
    def test_default_is_float32(self):
        assert get_transfer_config(_args()).dtype == "float32"

    def test_fused_defaults_to_bfloat16(self):
        assert get_transfer_config(_args(fused=1)).dtype == "bfloat16"
        assert get_transfer_config(_args(quant_int8=1)).dtype == "bfloat16"

    def test_explicit_dtype_wins(self):
        assert get_transfer_config(_args(fused=1, dtype="float32")).dtype == "float32"
        assert get_transfer_config(_args(dtype="bfloat16")).dtype == "bfloat16"

    def test_cli_flag_parses(self):
        parser = ArgumentParser()
        add_model_options(parser)
        args = parser.parse_args(["--dtype", "bfloat16"])
        assert args.dtype == "bfloat16"
        assert parser.parse_args([]).dtype is None  # None -> resolution rule

    def test_run_local_exclusion(self):
        """dtype is a serving-time choice, not a weights property: it must be
        in the run-local list that parse_and_load_from_model never overwrites
        from a checkpoint's args.json."""
        import inspect

        from motionstyle.cli import parser_util

        src = inspect.getsource(parser_util.parse_and_load_from_model)
        assert '"dtype"' in src


class TestBf16Forward:
    def test_bf16_outputs_fp32_and_match(self):
        """dtype='bfloat16' computes the stacks in bf16 but returns fp32
        outputs close to the fp32 forward (the CLAUDE.md convention: fp32
        params, bf16 compute, fp32 outputs)."""
        from motionstyle.models.denoiser import MDM, MDMConfig

        r = np.random.RandomState(0)
        B, C, T = 2, 181, 16
        x = jnp.asarray(r.randn(B, C, 1, T), jnp.float32) * 0.3
        t = jnp.asarray([3, 7])
        enc = jnp.asarray(r.randn(B, 16), jnp.float32)

        cfg32 = MDMConfig(njoints=C, nfeats=1, latent_dim=32, ff_size=64,
                          num_layers=2, num_heads=4, clip_dim=16)
        cfg16 = MDMConfig(njoints=C, nfeats=1, latent_dim=32, ff_size=64,
                          num_layers=2, num_heads=4, clip_dim=16,
                          dtype="bfloat16")
        m32, m16 = MDM(cfg32), MDM(cfg16)
        params = m32.init(jax.random.PRNGKey(0), x, t, enc,
                          deterministic=True)["params"]
        # params are shared (fp32 leaves) — only compute dtype differs
        y32 = m32.apply({"params": params}, x, t, enc, deterministic=True)
        y16 = m16.apply({"params": params}, x, t, enc, deterministic=True)
        assert y16.dtype == jnp.float32
        assert np.isfinite(np.asarray(y16)).all()
        denom = np.abs(np.asarray(y32)).max() + 1e-6
        rel = np.abs(np.asarray(y16) - np.asarray(y32)).max() / denom
        assert rel < 0.05, f"bf16 deviates {rel:.3f} from fp32"
