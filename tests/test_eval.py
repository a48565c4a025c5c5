"""RMSE evaluator + EncoderStack tests."""

import numpy as np
import jax
import jax.numpy as jnp

from deepphysinet_tpu.eval.rmse import evaluate_rmse
from deepphysinet_tpu.models.transformer_net import EncoderStack


def test_encoder_stack_shapes(rng):
    stack = EncoderStack(d_model=16, n_heads=2, d_ff=16, e_layers=1, inp_lens=(0, 1))
    x = jnp.asarray(rng.randn(1, 16, 16), jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), x)
    out = stack.apply(params, x)
    assert out.shape == (1, 16 + 8, 16)  # full + halved inputs concatenated


def test_evaluate_rmse_perfect_model_is_zero(rng):
    """A model that returns exactly the labels must evaluate to RMSE 0."""
    from deepphysinet_tpu.ops.coords import CoordSpec
    from deepphysinet_tpu.ops.normalization import OBS_NAME_ORDER, norm_specs_from_cfg
    from deepphysinet_tpu.train.train_step import StepConfig
    from tests.test_train_step import FACTORS, OBS_CFG

    specs = norm_specs_from_cfg(OBS_CFG)
    cfg = StepConfig(
        coord_spec=CoordSpec(lon_size=65, lat_size=37, dx=27000.0, dy=27000.0,
                             pred_t_span=86400.0),
        obs_specs=tuple(specs[k] for k in OBS_NAME_ORDER),
        loss_factor=FACTORS,
    )

    n = 64
    labels = rng.randn(n, 6).astype(np.float32) * 0.1

    class FakeDataset:
        forecast_time_period = 360.0

        def __len__(self):
            return 1

        def __getitem__(self, i):
            return {
                "field_data": np.zeros((4, 8), np.float32),
                "forecast_h": np.float32(24.0),
                "margin_x": rng.rand(n).astype(np.float32) * 27000 * 64,
                "margin_y": rng.rand(n).astype(np.float32) * 27000 * 36,
                "margin_t": (rng.randint(0, 25, n) * 3600.0).astype(np.float32),
                "margin_input_data": labels.copy(),  # conditioning == labels
                "margin_data": labels.copy(),
            }

    class FakeModel:
        """Echoes the conditioning values -> predictions == labels."""

        def apply(self, params, *args, method=None):
            name = getattr(method, "__name__", "")
            if name == "encode":
                return jnp.zeros((1, 4, 8))
            # decode(tokens, pe, nwp, fh) -> nwp
            return args[2]

    out = evaluate_rmse(FakeModel(), {}, cfg, FakeDataset(), points_per_window=n)
    for k in ("rmse_u10", "rmse_t2", "rmse_pres"):
        assert out[k] < 1e-4, out
