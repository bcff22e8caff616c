"""Synthetic U-FISH training: the trainable CNN path end-to-end.

Without egress the published checkpoints are unavailable, so accuracy on
the CNN path is established by training on the same generative model the
predictor is evaluated on (`models/ufish_train.py`): a short optax run
must (a) learn to separate spot from background pixels and (b) plug into
the standard predictor contract used by the pipeline.
"""

import numpy as np

from merfish3d_tpu.models.ufish import DoGSpotPredictor, UFishPredictor, get_predictor
from merfish3d_tpu.models.ufish_train import (
    render_training_batch,
    save_variables,
    train_ufish,
)


def test_trained_ufish_separates_spots(tmp_path):
    variables = train_ufish(steps=150, base_features=4, size=48, seed=1)
    pred = UFishPredictor(params=variables)
    assert pred.net.base_features == 4  # inferred from the params tree

    rng = np.random.default_rng(9)
    planes, targets = render_training_batch(rng, batch=4, size=48)
    probs = pred.predict(planes)
    assert probs.shape == planes.shape

    spot = probs[targets > 0.5]
    bg = probs[targets < 0.01]
    # learned separation: spot pixels score far above background
    assert spot.mean() > bg.mean() + 0.25, (spot.mean(), bg.mean())

    # A/B against the training-free DoG fallback on the same planes
    # (recorded, not gated: at this tiny training budget the DoG is near
    # ceiling on clean synthetics; the CNN catches up with longer training)
    dog = DoGSpotPredictor()
    dprob = dog.predict(planes)
    d_sep = dprob[targets > 0.5].mean() - dprob[targets < 0.01].mean()
    print(
        f"separation A/B: trained-UNet {spot.mean() - bg.mean():.3f} "
        f"vs DoG {d_sep:.3f}"
    )

    # round-trip through the pickled-checkpoint path used by the pipeline
    ckpt = tmp_path / "ufish_trained.pkl"
    save_variables(variables, ckpt)
    loaded = get_predictor("simfish", checkpoint_path=ckpt)
    assert isinstance(loaded, UFishPredictor)
    probs2 = loaded.predict(planes)
    np.testing.assert_allclose(probs2, probs, atol=1e-5)
