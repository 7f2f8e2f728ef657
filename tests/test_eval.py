"""T2M evaluator stack: metric identities + torch-parity via imported weights."""
import jax.numpy as jnp
import numpy as np
import pytest

from motionstyle.eval import metrics
from motionstyle.eval.evaluators import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    WordVectorizer,
    convert_cogru_encoder,
    convert_movement_encoder,
)


class TestMetrics:
    def test_fid_zero_for_identical(self):
        r = np.random.RandomState(0)
        act = r.randn(256, 16)
        mu, cov = metrics.calculate_activation_statistics(act)
        assert abs(metrics.calculate_frechet_distance(mu, cov, mu, cov)) < 1e-6

    def test_fid_positive_for_shifted(self):
        r = np.random.RandomState(0)
        a = r.randn(256, 16)
        b = a + 3.0
        mu1, c1 = metrics.calculate_activation_statistics(a)
        mu2, c2 = metrics.calculate_activation_statistics(b)
        fid = metrics.calculate_frechet_distance(mu1, c1, mu2, c2)
        assert abs(fid - 9 * 16) < 1.0  # ||3*ones(16)||^2 = 144

    def test_r_precision_perfect_match(self):
        r = np.random.RandomState(0)
        emb = r.randn(32, 8)
        top = metrics.calculate_r_precision(emb, emb, top_k=3, sum_all=True)
        assert top[0] == 32 and (np.diff(top) >= 0).all()

    def test_matching_score(self):
        a = np.zeros((4, 3))
        b = np.ones((4, 3))
        assert metrics.calculate_matching_score(a, b, sum_all=True) == pytest.approx(4 * np.sqrt(3))

    def test_diversity_and_multimodality_run(self):
        r = np.random.RandomState(0)
        div = metrics.calculate_diversity(r.randn(64, 8), 32, rng=np.random.RandomState(1))
        mm = metrics.calculate_multimodality(r.randn(8, 16, 8), 8, rng=np.random.RandomState(1))
        assert div > 0 and mm > 0

    def test_euclidean_distance_matrix(self):
        a = np.array([[0.0, 0.0], [3.0, 4.0]])
        d = metrics.euclidean_distance_matrix(a, a)
        np.testing.assert_allclose(d, [[0, 5], [5, 0]], atol=1e-6)


class TestEvaluatorParity:
    def _sd(self, g, prefix):
        return {k[len(prefix):]: g[k] for k in g.files if k.startswith(prefix)}

    def test_movement_encoder(self, goldens):
        g = goldens["evaluators"]
        enc = MovementConvEncoder()
        params = {"params": convert_movement_encoder(self._sd(g, "mv__"))}
        out = enc.apply(params, jnp.asarray(g["motions"][..., :-4]))
        np.testing.assert_allclose(np.asarray(out), g["movements"], atol=2e-4)

    def test_motion_encoder_variable_lengths(self, goldens):
        g = goldens["evaluators"]
        enc = MotionEncoderBiGRUCo()
        params = {"params": convert_cogru_encoder(self._sd(g, "mo__"), has_pos=False)}
        out = enc.apply(params, jnp.asarray(g["movements"]), jnp.asarray(g["m_lens"] // 4))
        np.testing.assert_allclose(np.asarray(out), g["motion_emb"], atol=2e-4)

    def test_text_encoder_variable_lengths(self, goldens):
        g = goldens["evaluators"]
        enc = TextEncoderBiGRUCo()
        params = {"params": convert_cogru_encoder(self._sd(g, "tx__"), has_pos=True)}
        out = enc.apply(params, jnp.asarray(g["word_embs"]), jnp.asarray(g["pos_ohot"]),
                        jnp.asarray(g["cap_lens"]))
        np.testing.assert_allclose(np.asarray(out), g["text_emb"], atol=2e-4)


class TestTorchGRUSequenceParity:
    def test_return_sequence_matches_reference_convention(self):
        """word_hids convention (modules.py:294-307): pad_packed zeros t>=len,
        backward half flipped within each valid length."""
        import jax
        import torch

        from motionstyle.eval.evaluators import TorchGRU

        B, T, D, H = 3, 7, 5, 4
        lengths = np.array([7, 5, 3])
        r = np.random.RandomState(0)
        x = r.randn(B, T, D).astype(np.float32)
        gru = TorchGRU(hidden_size=H, bidirectional=True, return_sequence=True)
        h0 = jnp.zeros((2, B, H))
        params = gru.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lengths), h0)
        out, seq = gru.apply(params, jnp.asarray(x), jnp.asarray(lengths), h0)

        tg = torch.nn.GRU(D, H, batch_first=True, bidirectional=True)
        tg.load_state_dict({k: torch.from_numpy(np.asarray(v))
                            for k, v in params["params"].items()})
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True)
        with torch.no_grad():
            gru_seq, gru_last = tg(packed)
        gru_seq = torch.nn.utils.rnn.pad_packed_sequence(gru_seq, batch_first=True)[0]
        forward = gru_seq[..., :H]
        backward = gru_seq[..., H:].clone()
        for i, L in enumerate(lengths):
            backward[i, :L] = torch.flip(backward[i, :L], dims=[0])
        ref_seq = torch.cat([forward, backward], dim=-1).numpy()
        ref_last = torch.cat([gru_last[0], gru_last[1]], dim=-1).numpy()
        np.testing.assert_allclose(np.asarray(seq), ref_seq, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out), ref_last, atol=1e-5)


class TestWordVectorizer:
    def test_fallback_deterministic_and_pos(self):
        wv = WordVectorizer()
        v1, p1 = wv["walk/NOUN"]
        v2, p2 = wv["walk/NOUN"]
        np.testing.assert_array_equal(v1, v2)
        # 'walk' is an Act_VIP word -> overrides the given POS
        assert p1[12] == 1
        _, p3 = wv["table/NOUN"]
        assert p3[1] == 1
        _, p4 = wv["zzzz/XXX"]
        assert p4[14] == 1
