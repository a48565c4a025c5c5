"""PhysicsNet: the variable encoder + six hypernet-conditioned coordinate MLPs.

Port of model/physics_net.py:17-60.  One forward = encode the field window once,
decode all six surface variables (u10, v10, PSFC, T2, q2, rho) at the query
coordinates.  TPU-native structure:

* ``encode`` runs once per step; its token output is closed over by every
  collocation-point evaluation (the reference gets this implicitly through
  Python object state).
* the six VariableNets are stacked with ``nn.vmap`` (parameters carry a leading
  [6] axis), so each decode layer is a single batched einsum across variables
  instead of six small kernels -- the MXU-friendly layout.
* ``decode`` is written per-window; the train step vmaps it over the window
  batch and the PDE engine differentiates through it with jax.linearize.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deepphysinet_tpu.models.transformer_net import TransformerNet
from deepphysinet_tpu.models.variable_net import VariableNet
from deepphysinet_tpu.registry import MODELS

# Output stacking order (physics_net.py:41-55 forward): coord_data column v is
# the reference value for variable v in this order.
VARIABLE_ORDER = ("u", "v", "p", "T", "q", "rio")


class PhysicsNet(nn.Module):
    meta_cfg: Dict[str, Any]  # TransformerNet kwargs (configs/...:13-24)
    net_cfg: Dict[str, Any]  # in_channels/hidden_channels/learnable_token_num (configs/...:25-32)
    compute_dtype: jnp.dtype = jnp.float32
    attn_impl: Optional[str] = None

    def setup(self):
        meta = {k: v for k, v in dict(self.meta_cfg).items() if k not in (
            "name", "dropout", "output_attention")}
        self.meta_net = TransformerNet(
            compute_dtype=self.compute_dtype, attn_impl=self.attn_impl, **meta
        )
        token_num = self.net_cfg["learnable_token_num"]
        in_channels = self.net_cfg["in_channels"]
        hidden_channels = self.net_cfg["hidden_channels"]
        stacked = nn.vmap(
            VariableNet,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(None, None, None, 0, None),
            out_axes=0,
        )
        self.variable_nets = stacked(
            token_num=token_num,
            in_channels=in_channels,
            hidden_channels=hidden_channels,
            compute_dtype=self.compute_dtype,
            name="variable_nets",
        )

    def encode(self, field_x: jnp.ndarray, forecast_h: jnp.ndarray) -> jnp.ndarray:
        """[B, L, enc_in], [B, 1] -> tokens [B, L + ltn, c_out] (meta_net.py:19-20)."""
        expected = self.net_cfg.get("token_num")
        if expected is not None and field_x.shape[1] != int(expected):
            # attention would silently accept a wrong-length sequence (e.g. a
            # field assembled without the constant rows); fail loudly instead
            raise ValueError(
                f"field has {field_x.shape[1]} tokens, net_cfg.token_num="
                f"{expected} (did the caller forget constant_variables?)")
        return self.meta_net(field_x, forecast_h)

    def decode(
        self,
        tokens: jnp.ndarray,  # [T, D] one window's encoder output
        coord_pe: jnp.ndarray,  # [N, in_channels]
        coord_data: jnp.ndarray,  # [N, 6]
        fore_h: jnp.ndarray,  # [1] normalized lead
    ) -> jnp.ndarray:
        """All six variables at the query points -> [N, 6] (normalized units)."""
        refs = jnp.moveaxis(coord_data, -1, 0)[..., None]  # [6, N, 1]
        out = self.variable_nets(tokens, coord_pe, coord_data, refs, fore_h)  # [6, N, 1]
        return jnp.moveaxis(out[..., 0], 0, -1)  # [N, 6]

    def __call__(
        self,
        field_x: jnp.ndarray,  # [B, L, enc_in]
        coord_pe: jnp.ndarray,  # [N, in_channels]
        coord_data: jnp.ndarray,  # [N, 6]
        forecast_h: jnp.ndarray,  # [B, 1]
    ) -> Tuple[jnp.ndarray, ...]:
        """Reference-parity forward (physics_net.py:41-55): returns (U, V, P, T, q, rio),
        each [N, 1], for a batch-1 window."""
        tokens = self.encode(field_x, forecast_h)
        out = self.decode(tokens[0], coord_pe, coord_data, forecast_h[0])
        return tuple(out[:, i : i + 1] for i in range(6))

    def forward_single(
        self,
        variable_name: str,
        tokens: jnp.ndarray,
        coord_pe: jnp.ndarray,
        coord_data: jnp.ndarray,
        fore_h: jnp.ndarray,
    ) -> jnp.ndarray:
        """Working equivalent of physics_net.py:57-60 (stale in the reference, SURVEY Q5)."""
        idx = VARIABLE_ORDER.index(variable_name)
        return self.decode(tokens, coord_pe, coord_data, fore_h)[:, idx : idx + 1]


@MODELS.register("PhysicsNet")
def build_physics_net(meta_cfg: dict, net_cfg: dict, compute_dtype=jnp.float32, attn_impl=None, **_):
    return PhysicsNet(
        meta_cfg=dict(meta_cfg),
        net_cfg=dict(net_cfg),
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
    )
