"""Hypernetwork-conditioned coordinate MLP (one output variable).

Port of model/variable_net.py:13-87.  The encoder's first ``token_num`` tokens
act as a weight generator: two dense layers map the [d_model, token_num] token
matrix to the weight+bias of the coordinate MLP's first two layers
(variable_net.py:57-65); the SineCos-encoded coordinate passes through those
generated layers (:67-70); PE-embedded interpolated-NWP values at the point and
the PE-embedded forecast lead are added (:71-81); a ResMLP trunk with an extra
skip and a scalar head follow (:82-85); and the output is a **residual on the
interpolated NWP value** (``x + ref_data``, :86).

This module is written per-window (unbatched tokens, [N] points); PhysicsNet
vmaps it over the six output variables (stacked parameters -> one batched
einsum per layer across variables, the MXU-friendly layout) and the train step
vmaps over the window batch.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from deepphysinet_tpu.models.init import torch_bias_init, torch_kernel_init
from deepphysinet_tpu.models.transformer_net import TorchDense
from deepphysinet_tpu.ops.position_encoding import make_freq_bands, sinecos_pe


class ResMLP(nn.Module):
    """fc -> relu -> fc plus input skip (variable_net.py:13-26)."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = TorchDense(self.features, self.compute_dtype, name="fc1")(x)
        out = nn.relu(out)
        out = TorchDense(self.features, self.compute_dtype, name="fc2")(out)
        return out + x


class VariableNet(nn.Module):
    token_num: int  # tokens consumed by the weight generator (net_cfg.learnable_token_num=256)
    in_channels: int  # coordinate PE width (192)
    hidden_channels: int  # trunk width (256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        meta_out: jnp.ndarray,  # [tokens, d_model] encoder output for this window
        coord_pe: jnp.ndarray,  # [N, in_channels] SineCos-encoded (x, y, t)
        coord_data: jnp.ndarray,  # [N, 6] interpolated NWP values (all 6 variables)
        ref_data: jnp.ndarray,  # [N, 1] this variable's interpolated NWP value
        fore_h: jnp.ndarray,  # [1] normalized forecast lead
    ) -> jnp.ndarray:
        cd = self.compute_dtype
        meta = meta_out[0 : self.token_num]  # [token_num, d_model] (variable_net.py:58)

        # Weight generation (variable_net.py:57-65): Linear layers applied to meta.T.
        w = TorchDense(self.in_channels + 1, cd, name="coord_input_fc")(meta.T)
        w1 = w[:, 0 : self.in_channels]  # [d_model, in_channels]
        b1 = w[:, self.in_channels]  # [d_model]
        w = TorchDense(self.hidden_channels + 1, cd, name="coord_hidden_fc")(meta.T)
        w2 = w[:, 0 : self.hidden_channels]  # [d_model, hidden]
        b2 = w[:, self.hidden_channels]  # [d_model]

        # Coordinate features through the generated layers (variable_net.py:67-70).
        x = (
            jnp.einsum(
                "ni,hi->nh",
                coord_pe.astype(cd),
                w1.astype(cd),
                preferred_element_type=jnp.float32,
            ).astype(cd)
            + b1.astype(cd)
        )
        x = nn.relu(x)
        x = (
            jnp.einsum(
                "nh,oh->no", x.astype(cd), w2.astype(cd), preferred_element_type=jnp.float32
            ).astype(cd)
            + b2.astype(cd)
        )

        # Conditioning additions (variable_net.py:71-81).
        pe6 = make_freq_bands(self.in_channels // 2 // 6, max_freq=4.0)
        coord_data_pe = sinecos_pe(coord_data, pe6, include_input=False)
        coord_data_pe = TorchDense(self.hidden_channels, cd, name="data_input_fc")(coord_data_pe)
        pe1 = make_freq_bands(self.in_channels // 2, max_freq=4.0)
        fore_h_pe = sinecos_pe(fore_h, pe1, include_input=False)  # [in_channels]
        fore_h_pe = TorchDense(self.hidden_channels, cd, name="fore_h_fc")(fore_h_pe)

        cat_x = x + coord_data_pe + fore_h_pe
        # Trunk: ResMLP plus an extra skip (variable_net.py:82-84).
        x = ResMLP(self.hidden_channels, cd, name="cat_fc1")(cat_x)
        x = x + cat_x
        x = TorchDense(1, cd, name="out_fc")(x)
        # Residual on the interpolated NWP value (variable_net.py:86); promote
        # back to f32 for the loss / residual assembly.
        return x.astype(jnp.float32) + ref_data.astype(jnp.float32)
