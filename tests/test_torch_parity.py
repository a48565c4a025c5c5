"""Independent-implementation parity: the JAX model vs a torch twin.

Real TIGGE/ERA5 data is unavailable here, so RMSE parity with the reference
cannot be measured directly.  The next-strongest evidence is numerical forward
parity against an INDEPENDENT implementation of the same architecture spec
(SURVEY 2.1/3.3) built on torch primitives -- torch.nn.Conv1d with circular
padding, torch LayerNorm/Linear, einsum attention -- exactly the op set the
reference uses.  Weights are copied from the JAX model into the torch twin;
outputs must agree to float tolerance.  This catches subtle porting mistakes
(circular-pad orientation, PE feature ordering, post-norm placement, hypernet
slicing) that same-implementation tests cannot.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from deepphysinet_tpu.models.physics_net import PhysicsNet
from deepphysinet_tpu.models.transformer_net import TransformerNet
from deepphysinet_tpu.ops.position_encoding import SineCosPE

META = dict(enc_in=50, c_out=24, d_model=24, n_heads=4, e_layers=2, d_ff=24,
            activation="gelu", learnable_token_num=6)
NET = dict(in_channels=192, hidden_channels=24, learnable_token_num=10)


def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


class TestPEParity:
    def test_sinecos_pe_matches_torch_formula(self):
        """PE layout vs the torch expand/transpose/stack/reshape sequence.

        Deterministic inputs: jnp-vs-torch sin/cos ULP differences grow with
        the argument (freqs reach 16), so the draw must be pinned for the
        tight tolerance to be meaningful.
        """
        x = np.random.RandomState(99).randn(7, 3).astype(np.float32)
        n_freqs = 16
        ours = np.asarray(SineCosPE(3, N_freqs=n_freqs, include_input=False)(jnp.asarray(x)))

        xt = _t(x)
        freq = 2.0 ** torch.linspace(0.0, 4.0, n_freqs)
        embeds = []
        for fn in (torch.sin, torch.cos):
            xf = xt[..., None].expand(xt.shape + (n_freqs,)) * freq
            embeds.append(fn(xf).transpose(-1, -2))
        ref = torch.stack(embeds, -2).reshape(x.shape[0], -1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestEncoderParity:
    def test_transformer_net_matches_torch_twin(self, rng):
        enc = TransformerNet(**META)
        x = jnp.asarray(rng.randn(1, 9, META["enc_in"]), jnp.float32)
        fh = jnp.asarray([[0.27]], jnp.float32)
        params = enc.init(jax.random.PRNGKey(3), x, fh)["params"]
        ours = np.asarray(enc.apply({"params": params}, x, fh))

        ref = self._torch_forward(params, np.asarray(x), 0.27)
        np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    def _torch_forward(self, p, x, fh):
        d = META["d_model"]
        # --- DataEmbedding: circular Conv1d(k=3) over tokens + pos + time PE ---
        conv = torch.nn.Conv1d(META["enc_in"], d, 3, padding=1, padding_mode="circular")
        with torch.no_grad():
            # flax kernel [k, c_in, d] -> torch [d, c_in, k]
            conv.weight.copy_(_t(p["enc_embedding"]["value_embedding"]["kernel"]).permute(2, 1, 0))
            conv.bias.copy_(_t(p["enc_embedding"]["value_embedding"]["bias"]))
        xt = _t(x)
        with torch.no_grad():
            v = conv(xt.permute(0, 2, 1)).transpose(1, 2)  # [B, L, d]
            tok = _t(p["learnable_token"])
            h = torch.cat([tok, v], dim=1)
            L = h.shape[1]
            # sinusoid positional table
            pe = torch.zeros(L, d)
            pos = torch.arange(0, L).float().unsqueeze(1)
            div = (torch.arange(0, d, 2).float() * -(np.log(10000.0) / d)).exp()
            pe[:, 0::2] = torch.sin(pos * div)
            pe[:, 1::2] = torch.cos(pos * div)
            # forecast-hour SineCos PE (d/2 freqs over 1 channel)
            freq = 2.0 ** torch.linspace(0.0, 4.0, d // 2)
            fh_t = torch.tensor([[fh]])
            xf = fh_t[..., None].expand(fh_t.shape + (d // 2,)) * freq
            time_emb = torch.stack([torch.sin(xf).transpose(-1, -2),
                                    torch.cos(xf).transpose(-1, -2)], -2).reshape(1, -1)
            h = h + pe[None] + time_emb[:, None, :]

            for i in range(META["e_layers"]):
                lp = p[f"layer_{i}"]
                h = self._torch_layer(lp, h)
            # final LN + projection
            h = torch.nn.functional.layer_norm(
                h, (d,), _t(p["norm"]["scale"]), _t(p["norm"]["bias"]))
            h = h @ _t(p["projection"]["kernel"]) + _t(p["projection"]["bias"])
        return h.numpy()

    def _torch_layer(self, lp, x):
        d, nh = META["d_model"], META["n_heads"]
        e = d // nh
        ap = lp["attention"]
        q = x @ _t(ap["query_projection"]["kernel"]) + _t(ap["query_projection"]["bias"])
        k = x @ _t(ap["key_projection"]["kernel"]) + _t(ap["key_projection"]["bias"])
        v = x @ _t(ap["value_projection"]["kernel"]) + _t(ap["value_projection"]["bias"])
        B, L, _ = x.shape
        q = q.view(B, L, nh, e)
        k = k.view(B, L, nh, e)
        v = v.view(B, L, nh, e)
        scores = torch.einsum("blhe,bshe->bhls", q, k)
        a = torch.softmax(scores / np.sqrt(e), dim=-1)
        o = torch.einsum("bhls,bshd->blhd", a, v).reshape(B, L, d)
        o = o @ _t(ap["out_projection"]["kernel"]) + _t(ap["out_projection"]["bias"])
        x = x + o
        x = torch.nn.functional.layer_norm(
            x, (d,), _t(lp["norm1"]["scale"]), _t(lp["norm1"]["bias"]))
        y = torch.nn.functional.gelu(
            x @ _t(lp["conv1"]["kernel"]) + _t(lp["conv1"]["bias"]))
        y = y @ _t(lp["conv2"]["kernel"]) + _t(lp["conv2"]["bias"])
        return torch.nn.functional.layer_norm(
            x + y, (d,), _t(lp["norm2"]["scale"]), _t(lp["norm2"]["bias"]))


class TestVariableNetParity:
    def test_hypernet_decode_matches_torch_twin(self, rng):
        model = PhysicsNet(meta_cfg=META, net_cfg=NET)
        field = jnp.asarray(rng.randn(1, 9, META["enc_in"]), jnp.float32)
        fh = jnp.asarray([[0.27]], jnp.float32)
        n = 11
        pe_in = jnp.asarray(rng.randn(n, NET["in_channels"]), jnp.float32)
        cd = jnp.asarray(rng.randn(n, 6) * 0.2, jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), field, pe_in, cd, fh)
        tokens = model.apply(variables, field, fh, method=PhysicsNet.encode)[0]
        ours = np.asarray(
            model.apply(variables, tokens, pe_in, cd, fh[0], method=PhysicsNet.decode))

        vp = variables["params"]["variable_nets"]
        ref = self._torch_decode(vp, np.asarray(tokens), np.asarray(pe_in),
                                 np.asarray(cd), 0.27)
        np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)

    def _torch_decode(self, vp, tokens, pe_in, cd, fh):
        """Per-variable torch twin of VariableNet.forward (variable_net.py:47-86)."""
        in_ch, hid, tn = NET["in_channels"], NET["hidden_channels"], NET["learnable_token_num"]
        outs = []
        with torch.no_grad():
            meta = _t(tokens)[:tn]  # [tn, d]
            for v in range(6):
                def lin(name, x):
                    return x @ _t(vp[name]["kernel"][v]) + _t(vp[name]["bias"][v])

                w = lin("coord_input_fc", meta.T)  # [d, in_ch+1]
                w1, b1 = w[:, :in_ch], w[:, in_ch]
                w = lin("coord_hidden_fc", meta.T)
                w2, b2 = w[:, :hid], w[:, hid]
                x = torch.relu(_t(pe_in) @ w1.T + b1) @ w2.T + b2

                # coord_data PE (6 channels, in_ch/2/6 freqs)
                nf = in_ch // 2 // 6
                freq = 2.0 ** torch.linspace(0.0, 4.0, nf)
                cdt = _t(cd)
                xf = cdt[..., None].expand(cdt.shape + (nf,)) * freq
                cd_pe = torch.stack([torch.sin(xf).transpose(-1, -2),
                                     torch.cos(xf).transpose(-1, -2)], -2)
                cd_pe = cd_pe.reshape(cd.shape[0], -1)
                cd_fc = lin("data_input_fc", cd_pe)

                nf2 = in_ch // 2
                freq2 = 2.0 ** torch.linspace(0.0, 4.0, nf2)
                fh_t = torch.tensor([fh])
                xf2 = fh_t[..., None].expand(fh_t.shape + (nf2,)) * freq2
                fh_pe = torch.stack([torch.sin(xf2).transpose(-1, -2),
                                     torch.cos(xf2).transpose(-1, -2)], -2).reshape(-1)
                fh_fc = lin("fore_h_fc", fh_pe)

                c = x + cd_fc + fh_fc
                # ResMLP: fc1 -> relu -> fc2 + skip, then extra skip
                f1 = c @ _t(vp["cat_fc1"]["fc1"]["kernel"][v]) + _t(vp["cat_fc1"]["fc1"]["bias"][v])
                f2 = torch.relu(f1) @ _t(vp["cat_fc1"]["fc2"]["kernel"][v]) + _t(vp["cat_fc1"]["fc2"]["bias"][v])
                y = (f2 + c) + c
                o = y @ _t(vp["out_fc"]["kernel"][v]) + _t(vp["out_fc"]["bias"][v])
                outs.append((o[:, 0] + cdt[:, v]).numpy())
        return np.stack(outs, -1)
