"""Registry factories, the generalized sampler, and paper SVG tooling."""

import jax
import jax.numpy as jnp
import numpy as np

from pixelsplat_tpu.model.decoder import DECODERS, get_decoder
from pixelsplat_tpu.model.decoder.decoder_splatting import (
    DecoderSplatting,
    DecoderSplattingCfg,
)
from pixelsplat_tpu.model.encoder import ENCODERS, get_encoder
from pixelsplat_tpu.model.encoder.common import sampler
from pixelsplat_tpu.model.encoder.encoder_epipolar import (
    EncoderEpipolar,
    EncoderEpipolarCfg,
)
from pixelsplat_tpu.paper.common import SvgFigure, encode_image


def test_encoder_registry():
    assert "epipolar" in ENCODERS
    encoder, visualizer_factory = get_encoder(EncoderEpipolarCfg())
    assert isinstance(encoder, EncoderEpipolar)
    assert visualizer_factory is not None


def test_decoder_registry_aliases_cuda_name():
    assert set(DECODERS) == {"splatting", "splatting_cuda"}
    decoder = get_decoder(DecoderSplattingCfg())
    assert isinstance(decoder, DecoderSplatting)


def test_generalized_sampler_topk_and_gather():
    pdf = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8)))
    index, density = sampler.sample(pdf, 2, deterministic=True)
    assert index.shape == (2, 3, 2)
    # Top-k really picks the argmax first.
    assert bool((index[..., 0] == pdf.argmax(-1)).all())
    target = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8, 5))
    gathered = sampler.gather(index, target)
    assert gathered.shape == (2, 3, 2, 5)
    np.testing.assert_allclose(
        np.asarray(gathered[0, 0, 0]),
        np.asarray(target[0, 0, int(index[0, 0, 0])]),
    )


def test_generalized_sampler_stochastic():
    pdf = jnp.asarray([[0.0, 0.0, 1.0, 0.0]])
    index, density = sampler.sample(
        pdf, 4, deterministic=False, key=jax.random.PRNGKey(0)
    )
    # A delta pdf must always sample its bucket.
    assert bool((index == 2).all())
    np.testing.assert_allclose(np.asarray(density), 1.0, atol=1e-5)


def test_svg_figure_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(size=(3, 8, 8)).astype(np.float32)
    uri = encode_image(img)
    assert uri.startswith("data:image/png;base64,")
    fig = SvgFigure(100, 50)
    fig.add_image(img, 0, 0, 40, 40)
    fig.add_line(0, 0, 100, 50, color="#d22")
    fig.add_circle(10, 10, 3)
    fig.add_text("hello", 5, 45)
    out = tmp_path / "fig.svg"
    fig.save(out)
    text = out.read_text()
    assert text.startswith("<svg") and "</svg>" in text
    assert "xlink:href" in text and "hello" in text
