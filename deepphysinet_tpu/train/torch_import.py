"""Reference torch checkpoint <-> flax parameter conversion.

A user switching from the reference (flyakon/DeepPhysiNet) has trained
``physics_{epoch}.pth`` files: ``torch.save`` bundles with a ``model`` torch
state_dict (reference interface_physics.py:53-62), ``epoch`` and
``gobal_step`` [sic] ints, and optionally a torch ``optimizer`` state.  This
module converts that state_dict to this framework's flax parameter tree (and
back), so reference checkpoints resume here without retraining.

Layout differences handled per layer family:

* torch ``nn.Linear.weight`` is ``[out, in]``; flax kernels are ``[in, out]``
  -> transpose.
* the token embedding is a circular ``nn.Conv1d(enc_in, d_model, 3)`` with
  weight ``[d_model, enc_in, 3]``; our im2col kernel is ``[3, enc_in,
  d_model]`` with tap k multiplying x[l + k - 1] -- exactly torch's
  cross-correlation order -> transpose (2, 1, 0), no tap flip.
* the FFN ``conv1``/``conv2`` are k=1 convs ``[out, in, 1]``; our equivalent
  dense kernels are ``[in, out]`` -> squeeze + transpose.
* ``nn.LayerNorm.weight`` -> flax ``scale``.
* the six per-variable nets (``U_net`` ... ``rio_net``, reference
  physics_net.py:26-31) are vmap-stacked here (models/physics_net.py:48-61):
  each flax leaf carries a leading [6] variable axis in VARIABLE_ORDER
  -> per-variable convert then stack.
* a ``module.`` DDP prefix (reference saves the wrapped net on the dist
  path) is stripped.

Optimizer state is NOT converted: torch Adam moments are per-parameter
tensors tied to torch's parameter ordering, and the reference never
checkpoints them anyway (SURVEY: resume restarts the optimizer).  Imports
therefore resume with fresh optimizer state -- pass
``allow_partial_resume=True`` semantics.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

# torch attribute prefix per output variable, in VARIABLE_ORDER (u, v, p, T,
# q, rio) -- reference physics_net.py:26-31 / models/physics_net.py:30.
TORCH_VARIABLE_PREFIXES = ("U_net", "V_net", "P_net", "T_net", "q_net", "rio_net")
_META_PFX = "meta_net.model."


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _strip_ddp(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def _linear(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd.pop(name + ".weight")).T,
            "bias": _np(sd.pop(name + ".bias"))}


def _conv1x1(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    w = _np(sd.pop(name + ".weight"))  # [out, in, 1]
    return {"kernel": w[:, :, 0].T, "bias": _np(sd.pop(name + ".bias"))}


def _layernorm(sd: Dict[str, Any], name: str) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd.pop(name + ".weight")),
            "bias": _np(sd.pop(name + ".bias"))}


def _meta_net(sd: Dict[str, Any]) -> Dict[str, Any]:
    g = _META_PFX
    conv_w = _np(sd.pop(g + "enc_embedding.value_embedding.tokenConv.weight"))
    out: Dict[str, Any] = {
        "enc_embedding": {"value_embedding": {
            "kernel": conv_w.transpose(2, 1, 0),
            "bias": _np(sd.pop(g + "enc_embedding.value_embedding.tokenConv.bias")),
        }},
        "learnable_token": _np(sd.pop(g + "learnable_token")),
        "norm": _layernorm(sd, g + "encoder.norm"),
        "projection": _linear(sd, g + "projection"),
    }
    i = 0
    while g + f"encoder.attn_layers.{i}.norm1.weight" in sd:
        lp = g + f"encoder.attn_layers.{i}."
        out[f"layer_{i}"] = {
            "attention": {
                p: _linear(sd, lp + f"attention.{p}")
                for p in ("query_projection", "key_projection",
                          "value_projection", "out_projection")
            },
            "conv1": _conv1x1(sd, lp + "conv1"),
            "conv2": _conv1x1(sd, lp + "conv2"),
            "norm1": _layernorm(sd, lp + "norm1"),
            "norm2": _layernorm(sd, lp + "norm2"),
        }
        i += 1
    if i == 0:
        raise ValueError("no encoder layers found under meta_net.model.encoder.attn_layers")
    return out


def _variable_nets(sd: Dict[str, Any]) -> Dict[str, Any]:
    def stacked_linear(name: str) -> Dict[str, np.ndarray]:
        ks, bs = [], []
        for var in TORCH_VARIABLE_PREFIXES:
            ks.append(_np(sd.pop(f"{var}.{name}.weight")).T)
            bs.append(_np(sd.pop(f"{var}.{name}.bias")))
        return {"kernel": np.stack(ks), "bias": np.stack(bs)}

    return {
        "coord_input_fc": stacked_linear("coord_input_fc"),
        "coord_hidden_fc": stacked_linear("coord_hidden_fc"),
        "data_input_fc": stacked_linear("data_input_fc"),
        "fore_h_fc": stacked_linear("fore_h_fc"),
        # reference ResMLP holds fc = Sequential(Linear, ReLU, Linear)
        # (variable_net.py:13-26) -> state keys cat_fc1.fc.{0,2}
        "cat_fc1": {"fc1": stacked_linear("cat_fc1.fc.0"),
                    "fc2": stacked_linear("cat_fc1.fc.2")},
        "out_fc": stacked_linear("out_fc"),
    }


def convert_torch_state_dict(torch_sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference ``physics_net.state_dict()`` -> flax variables dict.

    Returns ``{"params": {"meta_net": ..., "variable_nets": ...}}`` ready for
    ``PhysicsNet.apply``.  Strict: raises on missing or unconsumed keys so a
    architecture/config mismatch fails loudly instead of half-loading.
    """
    sd = _strip_ddp(torch_sd)
    try:
        params = {"meta_net": _meta_net(sd), "variable_nets": _variable_nets(sd)}
    except KeyError as e:
        raise ValueError(f"torch state_dict is missing expected key {e}") from e
    if sd:
        raise ValueError(f"unrecognized torch state_dict keys: {sorted(sd)[:8]}"
                         f"{' ...' if len(sd) > 8 else ''}")
    return {"params": params}


def export_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-named torch state_dict (numpy values).

    The exact inverse of ``convert_torch_state_dict``; lets a checkpoint
    trained here be loaded by the reference's
    ``physics_net.load_state_dict(..., strict=True)`` (after
    ``torch.from_numpy`` on each value).
    """
    params = variables["params"] if "params" in variables else variables
    sd: Dict[str, np.ndarray] = {}
    meta = params["meta_net"]
    g = _META_PFX
    ve = meta["enc_embedding"]["value_embedding"]
    sd[g + "enc_embedding.value_embedding.tokenConv.weight"] = _np(ve["kernel"]).transpose(2, 1, 0)
    sd[g + "enc_embedding.value_embedding.tokenConv.bias"] = _np(ve["bias"])
    sd[g + "learnable_token"] = _np(meta["learnable_token"])
    sd[g + "encoder.norm.weight"] = _np(meta["norm"]["scale"])
    sd[g + "encoder.norm.bias"] = _np(meta["norm"]["bias"])
    sd[g + "projection.weight"] = _np(meta["projection"]["kernel"]).T
    sd[g + "projection.bias"] = _np(meta["projection"]["bias"])
    for key in meta:
        if not key.startswith("layer_"):
            continue
        i = int(key.split("_")[1])
        lp = g + f"encoder.attn_layers.{i}."
        layer = meta[key]
        for p in ("query_projection", "key_projection", "value_projection",
                  "out_projection"):
            sd[lp + f"attention.{p}.weight"] = _np(layer["attention"][p]["kernel"]).T
            sd[lp + f"attention.{p}.bias"] = _np(layer["attention"][p]["bias"])
        for c in ("conv1", "conv2"):
            sd[lp + c + ".weight"] = _np(layer[c]["kernel"]).T[:, :, None]
            sd[lp + c + ".bias"] = _np(layer[c]["bias"])
        for n in ("norm1", "norm2"):
            sd[lp + n + ".weight"] = _np(layer[n]["scale"])
            sd[lp + n + ".bias"] = _np(layer[n]["bias"])

    vn = params["variable_nets"]

    def unstack(name: str, leaf: Mapping[str, Any]):
        for v, var in enumerate(TORCH_VARIABLE_PREFIXES):
            sd[f"{var}.{name}.weight"] = _np(leaf["kernel"][v]).T
            sd[f"{var}.{name}.bias"] = _np(leaf["bias"][v])

    for name in ("coord_input_fc", "coord_hidden_fc", "data_input_fc",
                 "fore_h_fc", "out_fc"):
        unstack(name, vn[name])
    unstack("cat_fc1.fc.0", vn["cat_fc1"]["fc1"])
    unstack("cat_fc1.fc.2", vn["cat_fc1"]["fc2"])
    return sd


def import_torch_checkpoint(path: str) -> Tuple[Dict[str, Any], int, int]:
    """Load a reference ``.pth`` bundle -> (flax variables, epoch, gobal_step).

    Requires torch (for the pickle opcode handlers of saved tensors).
    """
    import torch

    try:  # torch>=2.0 safe loader handles plain tensor/stateless bundles
        bundle = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        bundle = torch.load(path, map_location="cpu")
    model_sd = bundle["model"] if isinstance(bundle, dict) and "model" in bundle else bundle
    epoch = int(bundle.get("epoch", -1)) if isinstance(bundle, dict) else -1
    step = int(bundle.get("gobal_step", 0)) if isinstance(bundle, dict) else 0
    return convert_torch_state_dict(model_sd), epoch, step
