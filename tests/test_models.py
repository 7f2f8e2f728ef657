"""Model parity: flax MDM/StyleDiffusion vs the torch reference via imported
weights, CLIP text tower shape/semantics, CFG wrapper, tokenizer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.diffusion.ddpm import cfg_model_fn
from motionstyle.models import clip_text
from motionstyle.models.denoiser import MDM, MDMConfig, StyleDiffusion, mask_cond, trainable_param_filter
from motionstyle.models.torch_import import (
    assemble_style_diffusion_params,
    convert_encoder,
    convert_mdm,
    export_style_encoder,
)

CFG = MDMConfig(njoints=181, nfeats=1)


def _golden_sd(goldens):
    g = goldens["mdm_model"]
    return {k[len("sd__"):]: g[k] for k in g.files if k.startswith("sd__")}, g


class TestMDMParity:
    def test_forward_matches_torch(self, goldens):
        sd, g = _golden_sd(goldens)
        params = {"params": convert_mdm(sd, CFG)}
        model = MDM(CFG)
        out = model.apply(
            params, jnp.asarray(g["x"]), jnp.asarray(g["t"]), jnp.asarray(g["enc_text"])
        )
        assert out.shape == g["out"].shape
        np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4)

    def test_motion_encoder_masked_forward_matches_torch(self, goldens):
        sd, g = _golden_sd(goldens)
        model = StyleDiffusion(CFG)
        rng = jax.random.PRNGKey(0)
        x = jnp.asarray(g["x"])
        params = model.init(rng, x, jnp.asarray(g["t"]), jnp.asarray(g["enc_text"]))["params"]
        params["mdm"] = convert_mdm(sd, CFG)
        params["mu_query"] = g["mu_q"]
        params["sigma_query"] = g["sig_q"]
        # golden reuses the mdm encoder as the motion encoder
        params["motion_enc_encoder"] = convert_encoder(sd, "seqTransEncoder", CFG.num_layers)
        mu = model.apply(
            {"params": params}, x, jnp.asarray(g["frame_mask"]),
            method=StyleDiffusion.encode_motion,
        )
        np.testing.assert_allclose(np.asarray(mu), g["mu"], atol=2e-4)

    def test_denoise_with_motion_code_composition(self, goldens):
        """finetune_forward parity (mdm_forstyledataset.py:136-180): the
        discriminator-training forward equals denoise_prior conditioned on
        encode_motion's mu; uncond zeroes the code (mask_cond force_mask)."""
        sd, g = _golden_sd(goldens)
        model = StyleDiffusion(CFG)
        x = jnp.asarray(g["x"])
        t = jnp.asarray(g["t"])
        params = model.init(jax.random.PRNGKey(0), x, t, jnp.asarray(g["enc_text"]),
                            method=StyleDiffusion.full_init)["params"]
        params["mdm"] = convert_mdm(sd, CFG)
        fm = jnp.asarray(g["frame_mask"])
        out = model.apply({"params": params}, x, t, x, fm,
                          method=StyleDiffusion.denoise_with_motion_code)
        mu = model.apply({"params": params}, x, fm, method=StyleDiffusion.encode_motion)
        ref = model.apply({"params": params}, x, t, mu, method=StyleDiffusion.denoise_prior)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        out_u = model.apply({"params": params}, x, t, x, fm, True,
                            method=StyleDiffusion.denoise_with_motion_code)
        ref_u = model.apply({"params": params}, x, t, jnp.zeros_like(mu),
                            method=StyleDiffusion.denoise_prior)
        np.testing.assert_allclose(np.asarray(out_u), np.asarray(ref_u), atol=1e-6)

    def test_style_forward_uses_style_encoder(self, goldens):
        sd, g = _golden_sd(goldens)
        model = StyleDiffusion(CFG)
        x = jnp.asarray(g["x"])
        params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(g["t"]), jnp.asarray(g["enc_text"]))["params"]
        params["mdm"] = convert_mdm(sd, CFG)
        # style encoder initialized with the SAME weights as the mdm encoder
        # => style forward must equal prior forward
        params["style_encoder"] = convert_encoder(sd, "seqTransEncoder", CFG.num_layers)
        out_style = model.apply({"params": params}, x, jnp.asarray(g["t"]), jnp.asarray(g["enc_text"]))
        np.testing.assert_allclose(np.asarray(out_style), g["out"], atol=2e-4)

    def test_checkpoint_export_round_trip(self, goldens):
        sd, g = _golden_sd(goldens)
        params = {"params": {"style_encoder": convert_encoder(sd, "seqTransEncoder", CFG.num_layers)}}
        exported = export_style_encoder(params, CFG.num_layers)
        re_imported = convert_encoder(exported, "seqTransEncoder", CFG.num_layers)
        flat_a = jax.tree_util.tree_leaves(params["params"]["style_encoder"])
        flat_b = jax.tree_util.tree_leaves(re_imported)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_trainable_filter(self):
        assert trainable_param_filter(("style_encoder", "layers_0"))
        assert not trainable_param_filter(("mdm", "seqTransEncoder"))
        assert not trainable_param_filter(("motion_enc_encoder",))


class TestDiffuseTransfer:
    """DiffuseTransfer (humanml residual-code variant; reference
    DiffuseTrasnfer sic, mdm_forstyledataset.py:628-760). The reference's
    own consumer path is bit-rotted (demo_style_transfer.py:164 dereferences
    model.controlmdm which no shipped class has; model_util.py:18-23 asserts
    a class absent from the tree) — here the module is a first-class tested
    citizen: golden forward parity, torch-checkpoint converter, CFG
    semantics."""

    DT_CFG = MDMConfig(njoints=32, nfeats=1, latent_dim=64, ff_size=128,
                       num_layers=2, num_heads=4, clip_dim=64, dropout=0.1)

    def _golden(self, goldens):
        g = goldens["diffuse_transfer"]
        sd = {k[len("sd__"):]: g[k] for k in g.files if k.startswith("sd__")}
        return sd, g

    def test_forward_matches_torch(self, goldens):
        from motionstyle.models.denoiser import DiffuseTransfer
        from motionstyle.models.torch_import import (
            assemble_diffuse_transfer_params,
        )

        sd, g = self._golden(goldens)
        params = assemble_diffuse_transfer_params(self.DT_CFG, sd)
        model = DiffuseTransfer(self.DT_CFG)
        out = model.apply(params, jnp.asarray(g["x"]), jnp.asarray(g["t"]),
                          jnp.asarray(g["mu"]), jnp.asarray(g["style_code"]),
                          jnp.asarray(g["content_code"]))
        assert out.shape == g["out"].shape
        np.testing.assert_allclose(np.asarray(out), g["out"], atol=2e-4)

    def test_residual_code_semantics(self, goldens):
        """style_code == content_code must reduce to the plain text
        condition (input_mu = enc_text + (s - c), :745-747); zeroed text +
        swapped residual sign shifts the condition the opposite way."""
        from motionstyle.models.denoiser import DiffuseTransfer
        from motionstyle.models.torch_import import (
            assemble_diffuse_transfer_params,
        )

        sd, g = self._golden(goldens)
        params = assemble_diffuse_transfer_params(self.DT_CFG, sd)
        model = DiffuseTransfer(self.DT_CFG)
        x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
        mu = jnp.asarray(g["mu"])
        s, c = jnp.asarray(g["style_code"]), jnp.asarray(g["content_code"])
        same = model.apply(params, x, t, mu, c, c)
        plain = model.apply(params, x, t, mu, jnp.zeros_like(s),
                            jnp.zeros_like(c))
        np.testing.assert_allclose(np.asarray(same), np.asarray(plain),
                                   atol=1e-5)
        shifted = model.apply(params, x, t, mu, s, c)
        assert not np.allclose(np.asarray(shifted), np.asarray(plain),
                               atol=1e-3)

    def test_uncond_zeroes_whole_condition(self, goldens):
        """uncond=True is force_mask on input_mu (:727-733): equals feeding
        all-zero text AND codes."""
        from motionstyle.models.denoiser import DiffuseTransfer
        from motionstyle.models.torch_import import (
            assemble_diffuse_transfer_params,
        )

        sd, g = self._golden(goldens)
        params = assemble_diffuse_transfer_params(self.DT_CFG, sd)
        model = DiffuseTransfer(self.DT_CFG)
        x, t = jnp.asarray(g["x"]), jnp.asarray(g["t"])
        z = jnp.zeros_like(jnp.asarray(g["mu"]))
        un = model.apply(params, x, t, jnp.asarray(g["mu"]),
                         jnp.asarray(g["style_code"]),
                         jnp.asarray(g["content_code"]), uncond=True)
        ref = model.apply(params, x, t, z, z, z)
        np.testing.assert_allclose(np.asarray(un), np.asarray(ref), atol=1e-5)

    def test_encode_motion_and_init(self, goldens):
        """encode_motion rides the shared _encode_motion_mu helper (pinned
        by the semantic golden); full_init materializes every subtree the
        converter fills."""
        from motionstyle.models.denoiser import DiffuseTransfer
        from motionstyle.models.torch_import import (
            assemble_diffuse_transfer_params,
        )

        sd, g = self._golden(goldens)
        model = DiffuseTransfer(self.DT_CFG)
        init = model.init(jax.random.PRNGKey(0),
                          jnp.asarray(g["x"]), jnp.asarray(g["t"]),
                          jnp.asarray(g["mu"]),
                          method=DiffuseTransfer.full_init)["params"]
        conv = assemble_diffuse_transfer_params(self.DT_CFG, sd)["params"]
        ia, ib = jax.tree_util.tree_structure(init), \
            jax.tree_util.tree_structure(conv)
        assert ia == ib, (ia, ib)
        mu1 = model.apply({"params": conv}, jnp.asarray(g["x"]),
                          method=DiffuseTransfer.encode_motion)
        mu2 = model.apply({"params": conv}, jnp.asarray(g["x"]) + 1.0,
                          method=DiffuseTransfer.encode_motion)
        assert mu1.shape == (g["x"].shape[0], self.DT_CFG.latent_dim)
        assert not np.allclose(np.asarray(mu1), np.asarray(mu2))


class TestCFG:
    def test_cfg_scale_one_equals_cond(self, goldens):
        sd, g = _golden_sd(goldens)
        model = MDM(CFG)
        params = {"params": convert_mdm(sd, CFG)}

        def model_fn(x, t, cond):
            return model.apply(params, x, t, cond["enc_text"])

        x = jnp.asarray(g["x"][:1])
        t = jnp.asarray(g["t"][:1])
        cond = {"enc_text": jnp.asarray(g["enc_text"][:1])}
        guided = cfg_model_fn(model_fn, jnp.ones((1,)))(x, t, cond)
        plain = model_fn(x, t, cond)
        np.testing.assert_allclose(np.asarray(guided), np.asarray(plain), atol=1e-5)

    def test_cfg_formula(self, goldens):
        sd, g = _golden_sd(goldens)
        model = MDM(CFG)
        params = {"params": convert_mdm(sd, CFG)}

        def model_fn(x, t, cond):
            return model.apply(params, x, t, cond["enc_text"])

        x = jnp.asarray(g["x"][:1])
        t = jnp.asarray(g["t"][:1])
        enc = jnp.asarray(g["enc_text"][:1])
        scale = 2.5
        guided = cfg_model_fn(model_fn, jnp.full((1,), scale))(x, t, {"enc_text": enc})
        out_c = model_fn(x, t, {"enc_text": enc})
        out_u = model_fn(x, t, {"enc_text": jnp.zeros_like(enc)})
        expect = out_u + scale * (out_c - out_u)
        np.testing.assert_allclose(np.asarray(guided), np.asarray(expect), atol=1e-4)

    def test_mask_cond_probabilities(self):
        enc = jnp.ones((512, 8))
        dropped = mask_cond(jax.random.PRNGKey(0), enc, 0.5)
        frac = float((np.asarray(dropped).sum(-1) == 0).mean())
        assert 0.35 < frac < 0.65


class TestClipText:
    def test_tokenize_shapes_and_specials(self):
        ids = clip_text.tokenize(["a person is walking angry", "hi"])
        assert ids.shape == (2, 77)
        assert (ids[:, 0] == clip_text.SOT).all()
        for row in ids:
            nz = row[row != 0]
            assert nz[-1] == clip_text.EOT

    def test_encoder_runs_and_pools_eot(self):
        enc = clip_text.ClipTextEncoder()
        ids = jnp.asarray(clip_text.tokenize(["a person is walking angry"]))
        params = enc.init(jax.random.PRNGKey(0), ids)
        out = enc.apply(params, ids)
        assert out.shape == (1, 512)
        assert np.isfinite(np.asarray(out)).all()

    def test_humanml_context_trick(self):
        ids = clip_text.tokenize(["hello"], context_length=22)
        padded = np.concatenate([ids, np.zeros((1, 55), dtype=np.int32)], axis=1)
        assert padded.shape == (1, 77)

    def test_causal_mask(self):
        # prefix invariance: token t's features must not depend on tokens > t
        enc = clip_text.ClipTextEncoder(clip_text.ClipTextConfig(layers=2))
        ids1 = clip_text.tokenize(["a person walks"])
        ids2 = ids1.copy()
        ids2[0, 40:] = 99  # mutate far-future positions (beyond EOT argmax? keep below)
        ids2[0, 76] = 100
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids1))
        # compare hidden at EOT: argmax index for ids2 may shift; instead
        # compare the pooled output with future-token mutation BEFORE eot idx
        # kept identical -> equality only if causal mask works AND eot same.
        eot_idx = int(np.argmax(ids1[0]))
        out1 = enc.apply(params, jnp.asarray(ids1))
        ids3 = ids1.copy()
        ids3[0, eot_idx + 1 :] = 55
        out3 = enc.apply(params, jnp.asarray(ids3))
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out3), atol=1e-5)
