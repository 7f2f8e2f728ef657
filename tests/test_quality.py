"""End-to-end functional proof of style transfer (VERDICT r2 item 1).

Runs tools/quality_protocol.py on the forced-CPU mesh: procedural two-style
corpus -> in-framework prior pretraining -> few-shot finetune via the real
CLI -> transfer demo -> style/content metrics. Asserts the three properties
that define the method (QUALITY.md):
  (a) root_horizontal channels preserved exactly,
  (b) style-feature distance moves significantly toward the style example
      vs the pre-finetune output,
  (c) content identity retained.
"""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def protocol_result(tmp_path_factory):
    from tools.quality_protocol import run_protocol

    work = str(tmp_path_factory.mktemp("quality"))
    return run_protocol(work)


@pytest.mark.slow
class TestStyleTransferQuality:
    def test_root_horizontal_preserved_exactly(self, protocol_result):
        assert protocol_result["pre"]["root_horizontal_max_abs_err"] < 1e-4
        assert protocol_result["post"]["root_horizontal_max_abs_err"] < 1e-4

    def test_style_moves_toward_example(self, protocol_result):
        """The finetune must reduce the style-descriptor distance to the
        style example by a clear margin (TPU headline: -22%; threshold -8%
        leaves room for CPU-vs-TPU trajectory divergence)."""
        pre = protocol_result["pre"]["style_dist_to_example"]
        post = protocol_result["post"]["style_dist_to_example"]
        assert post < 0.92 * pre, (pre, post)
        # and the output is closer to the style than the content was
        assert protocol_result["post"]["style_dist_ratio"] < 0.92, protocol_result["post"]

    def test_content_identity_retained(self, protocol_result):
        """Low-pass pose correlation with the content stays high (TPU
        headline: 0.73) — the transfer styles the content, it does not
        replace it."""
        assert protocol_result["post"]["content_similarity"] > 0.45, protocol_result["post"]

    def test_pre_finetune_baseline_sane(self, protocol_result):
        """The warm-start baseline reproduces the content faithfully and
        shows no style movement — the delta measured above is attributable
        to the finetune, not the sampler."""
        assert protocol_result["pre"]["content_similarity"] > 0.8
        assert protocol_result["pre"]["style_dist_ratio"] > 0.92
