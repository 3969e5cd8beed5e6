"""diffusers/transformers checkpoint import/export (safetensors).

Behavior contract: the reference loads pretrained SVD weights via
``from_pretrained`` (train_svd.py:643-656) and exports finetuned ones with
``save_pretrained`` / ``save_lora_weights`` (train_svd.py:1173-1180,
train_svd_lora.py:1070-1074). This module maps between those on-disk formats
(diffusers UNet/VAE state dicts, transformers CLIP vision state dict,
peft-style LoRA safetensors) and our flax param pytrees, so pretrained SVD
checkpoints load here and finetuned ones round-trip back.

Layout conventions translated:
  - Dense:  flax (in, out)        <-> torch Linear (out, in)
  - Conv2d: flax HWIO             <-> torch OIHW
  - temporal conv: flax (3, 1, I, O) <-> torch Conv3d (O, I, 3, 1, 1)
  - CLIP patch-embed: flax (p*p*3, width) matmul <-> torch Conv2d (width,3,p,p)
  - norms: flax scale/bias        <-> torch weight/bias
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

Tree = Any

# ------------------------------------------------------------- tree utils --

def flatten(tree: Tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path):
            np.asarray(v) for path, v in flat}


def unflatten(flat: Dict[str, np.ndarray]) -> Tree:
    tree: dict = {}
    for path, value in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def fill_template(template: Tree, flat: Dict[str, np.ndarray],
                  strict: bool = True) -> Tree:
    """Replace template leaves by flat[path]; validates shape agreement."""
    t_flat = flatten(template)
    missing = sorted(set(t_flat) - set(flat))
    extra = sorted(set(flat) - set(t_flat))
    if strict and (missing or extra):
        raise ValueError(f"param mismatch: missing={missing[:5]}... "
                         f"({len(missing)}), extra={extra[:5]}... ({len(extra)})")
    out = {}
    for k, v in t_flat.items():
        src = flat.get(k, v)
        if src.shape != v.shape:
            raise ValueError(f"{k}: shape {src.shape} != template {v.shape}")
        out[k] = src.astype(v.dtype)
    return unflatten(out)


# -------------------------------------------------- name-mapping machinery --

# flax 'name_N' module-list segments that become torch '.N'
_INDEXED = (
    "down_blocks|up_blocks|resnets|attentions|transformer_blocks|"
    "temporal_transformer_blocks|downsamplers|upsamplers|layers"
)
_SEG_RE = re.compile(rf"^({_INDEXED})_(\d+)$")
# VAE flat names like down_blocks_0_resnets_1 / up_blocks_2_upsamplers_0
_VAE_RE = re.compile(r"^(down_blocks|up_blocks)_(\d+)_(resnets|downsamplers|upsamplers)_(\d+)$")
_MID_RE = re.compile(r"^mid_(resnets|attentions)_(\d+)$")


def _flax_path_to_torch(path: str) -> str:
    """Generic flax->torch key (leaf-name handling done by callers)."""
    segs = []
    for seg in path.split("/"):
        m = _VAE_RE.match(seg)
        if m:
            segs.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}")
            continue
        m = _MID_RE.match(seg)
        if m:
            segs.append(f"mid_block.{m.group(1)}.{m.group(2)}")
            continue
        m = _SEG_RE.match(seg)
        if m:
            segs.append(f"{m.group(1)}.{m.group(2)}")
            continue
        segs.append(seg)
    key = ".".join(segs)
    # module-name fixups
    key = key.replace("ff.net_0_proj", "ff.net.0.proj")
    key = key.replace("ff.net_2", "ff.net.2")
    key = key.replace("ff_in.net_0_proj", "ff_in.net.0.proj")
    key = key.replace("ff_in.net_2", "ff_in.net.2")
    key = re.sub(r"\bto_out\b", "to_out.0", key)
    return key


def _is_temporal_conv(path: str, arr: np.ndarray) -> bool:
    return arr.ndim == 4 and arr.shape[1] == 1 and arr.shape[0] == 3 and (
        "temporal_res_block" in path or "time_conv_out" in path)


def _kernel_to_torch(path: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 2:                      # Dense (in, out) -> (out, in)
        return arr.T
    if _is_temporal_conv(path, arr):       # (3, 1, I, O) -> (O, I, 3, 1, 1)
        return arr.transpose(3, 2, 0, 1)[..., None]
    if arr.ndim == 4:                      # HWIO -> OIHW
        return arr.transpose(3, 2, 0, 1)
    raise ValueError(f"unhandled kernel rank for {path}: {arr.shape}")


def _kernel_from_torch(path: str, arr: np.ndarray, temporal: bool) -> np.ndarray:
    if arr.ndim == 2:
        return arr.T
    if arr.ndim == 5:                      # Conv3d (O, I, 3, 1, 1) -> (3, 1, I, O)
        return arr[..., 0].transpose(2, 3, 1, 0)
    if arr.ndim == 4:                      # OIHW -> HWIO
        return arr.transpose(2, 3, 1, 0)
    raise ValueError(f"unhandled torch kernel rank for {path}: {arr.shape}")


def flax_to_diffusers(params: Tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Our UNet/VAE param tree -> diffusers-style torch state dict (numpy).

    Extension subtrees (the Tracklet2Video branch) are EXCLUDED — they have
    no diffusers counterpart; export them with tracklet_branch_to_flat()."""
    out: Dict[str, np.ndarray] = {}
    for path, arr in flatten(params).items():
        if _is_extension_path(path):
            continue
        base, leaf = path.rsplit("/", 1) if "/" in path else ("", path)
        key = _flax_path_to_torch(base) if base else ""
        if leaf == "kernel":
            out[f"{prefix}{key}.weight"] = _kernel_to_torch(path, arr)
        elif leaf == "scale":
            out[f"{prefix}{key}.weight"] = arr
        elif leaf == "bias":
            out[f"{prefix}{key}.bias"] = arr
        elif leaf == "mix_factor":
            out[f"{prefix}{key}.mix_factor"] = arr.reshape(-1)
        else:
            out[f"{prefix}{key}.{leaf}" if key else f"{prefix}{leaf}"] = arr
    return out


# Param subtrees that are THIS framework's extensions (no diffusers
# counterpart): kept at their template (init) values when importing a
# pretrained checkpoint — the Tracklet2Video branch is zero-gated, so a
# stock SVD checkpoint + fresh branch is exactly the pretrained model.
_EXTENSION_PREFIXES = ("tracklet_conditioner",)
_EXTENSION_SEGMENTS = ("gated_attentions_",)


def _is_extension_path(path: str) -> bool:
    return (path.startswith(_EXTENSION_PREFIXES)
            or any(seg in path for seg in _EXTENSION_SEGMENTS))


def diffusers_to_flax(state_dict: Dict[str, np.ndarray], template: Tree,
                      strict: bool = True) -> Tree:
    """diffusers state dict -> our tree, guided by a (shape-bearing) template.

    We invert by mapping every template path to its torch key and pulling the
    tensor from the state dict — this avoids guessing flax structure from
    torch names. Extension subtrees (_EXTENSION_PREFIXES/_SEGMENTS) keep
    their template init values."""
    flat_out: Dict[str, np.ndarray] = {}
    t_flat = flatten(template)
    missing = []
    for path, tarr in t_flat.items():
        if _is_extension_path(path):
            flat_out[path] = np.asarray(tarr)
            continue
        base, leaf = path.rsplit("/", 1) if "/" in path else ("", path)
        key = _flax_path_to_torch(base) if base else ""
        if leaf == "kernel":
            tkey = f"{key}.weight"
        elif leaf == "scale":
            tkey = f"{key}.weight"
        elif leaf == "bias":
            tkey = f"{key}.bias"
        elif leaf == "mix_factor":
            tkey = f"{key}.mix_factor"
        else:
            tkey = f"{key}.{leaf}" if key else leaf
        if tkey not in state_dict:
            missing.append(tkey)
            continue
        arr = np.asarray(state_dict[tkey])
        if leaf == "kernel":
            arr = _kernel_from_torch(path, arr, _is_temporal_conv(path, tarr))
        if leaf == "mix_factor":
            arr = arr.reshape(tarr.shape)
        flat_out[path] = arr
    if strict and missing:
        raise ValueError(f"{len(missing)} keys missing from state dict, "
                         f"e.g. {missing[:5]}")
    n_mapped = sum(1 for p in flat_out if not _is_extension_path(p))
    if strict and n_mapped < len(state_dict):
        raise ValueError(
            f"{len(state_dict) - n_mapped} state-dict keys unused")
    return fill_template(template, flat_out, strict=strict)


# -------------------------------------------- Tracklet2Video branch I/O ----

def tracklet_branch_to_flat(unet_params: Tree) -> Dict[str, np.ndarray]:
    """The trained Tracklet2Video branch as a flat {path: array} dict — the
    LoRA-like exchange artifact for box-conditioned finetunes (the base UNet
    stays a stock diffusers checkpoint)."""
    return {p: np.asarray(a) for p, a in flatten(unet_params).items()
            if _is_extension_path(p) and a is not None}


def tracklet_branch_into_tree(flat: Dict[str, np.ndarray],
                              unet_params: Tree) -> Tree:
    """Merge a tracklet_branch_to_flat() dict into a (tracklet-enabled) UNet
    tree; validates every saved path exists in the template."""
    t_flat = flatten(unet_params)
    unknown = sorted(set(flat) - set(t_flat))
    if unknown:
        raise ValueError(f"unknown tracklet params: {unknown[:5]}... "
                         f"({len(unknown)})")
    merged = dict(t_flat)
    for p, a in flat.items():
        if np.asarray(a).shape != np.asarray(merged[p]).shape:
            raise ValueError(f"{p}: shape {np.asarray(a).shape} != "
                             f"{np.asarray(merged[p]).shape}")
        merged[p] = np.asarray(a).astype(np.asarray(merged[p]).dtype)
    return unflatten(merged)


# ------------------------------------------------------------------- CLIP --

def clip_flax_to_transformers(params: Tree, patch_size: int = 14
                              ) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    flat = flatten(params)
    for path, arr in flat.items():
        if path == "patch_embedding/kernel":
            width = arr.shape[1]
            w = arr.reshape(patch_size, patch_size, 3, width).transpose(3, 2, 0, 1)
            out["vision_model.embeddings.patch_embedding.weight"] = w
        elif path == "class_embedding":
            out["vision_model.embeddings.class_embedding"] = arr
        elif path == "position_embedding":
            out["vision_model.embeddings.position_embedding.weight"] = arr
        elif path.startswith("pre_layrnorm") or path.startswith("post_layernorm"):
            name, leaf = path.split("/")
            out[f"vision_model.{name}.{'weight' if leaf == 'scale' else 'bias'}"] = arr
        elif path == "visual_projection/kernel":
            out["visual_projection.weight"] = arr.T
        else:
            m = re.match(r"^layers_(\d+)/(.+)$", path)
            if not m:
                raise ValueError(f"unmapped CLIP param {path}")
            i, rest = m.group(1), m.group(2)
            base, leaf = rest.rsplit("/", 1)
            tleaf = {"kernel": "weight", "scale": "weight", "bias": "bias"}[leaf]
            if base in ("q_proj", "k_proj", "v_proj", "out_proj"):
                base = f"self_attn.{base}"
            else:
                base = base.replace("/", ".")
            arr_t = arr.T if leaf == "kernel" else arr
            out[f"vision_model.encoder.layers.{i}.{base}.{tleaf}"] = arr_t
    return out


def clip_transformers_to_flax(state_dict: Dict[str, np.ndarray], template: Tree,
                              patch_size: int = 14, strict: bool = True) -> Tree:
    flat_out: Dict[str, np.ndarray] = {}
    t_flat = flatten(template)
    # rebuild by replaying the forward mapping path-by-path
    for path, tarr in t_flat.items():
        single = clip_flax_to_transformers(unflatten({path: tarr}), patch_size)
        (tkey, _), = single.items()
        if tkey not in state_dict:
            if strict:
                raise ValueError(f"missing CLIP key {tkey}")
            continue
        arr = np.asarray(state_dict[tkey])
        if path == "patch_embedding/kernel":
            width = arr.shape[0]
            arr = arr.transpose(2, 3, 1, 0).reshape(patch_size * patch_size * 3, width)
        elif path.endswith("/kernel"):
            arr = arr.T
        flat_out[path] = arr
    return fill_template(template, flat_out, strict=strict)


# ------------------------------------------------------------------- LoRA --

def lora_flax_to_diffusers(lora: Dict[str, Dict[str, np.ndarray]]
                           ) -> Dict[str, np.ndarray]:
    """Our LoRA tree -> peft/diffusers-style keys:
    unet.<module>.lora_A.weight (r, in) / lora_B.weight (out, r)
    (matches StableVideoDiffusionPipeline.save_lora_weights output,
    train_svd_lora.py:1070-1074)."""
    out = {}
    for path, ab in lora.items():
        base = _flax_path_to_torch(path[: -len("/kernel")])
        out[f"unet.{base}.lora_A.weight"] = np.asarray(ab["a"]).T
        out[f"unet.{base}.lora_B.weight"] = np.asarray(ab["b"]).T
    return out


def lora_diffusers_to_flax(state_dict: Dict[str, np.ndarray],
                           template: Dict[str, Dict[str, np.ndarray]]
                           ) -> Dict[str, Dict[str, np.ndarray]]:
    out = {}
    for path, ab in template.items():
        base = _flax_path_to_torch(path[: -len("/kernel")])
        a = np.asarray(state_dict[f"unet.{base}.lora_A.weight"]).T
        b = np.asarray(state_dict[f"unet.{base}.lora_B.weight"]).T
        if a.shape != ab["a"].shape or b.shape != ab["b"].shape:
            raise ValueError(f"LoRA shape mismatch at {path}")
        out[path] = {"a": a, "b": b}
    return out


# ------------------------------------------------------------ safetensors --

def save_safetensors(path: str, state_dict: Dict[str, np.ndarray],
                     metadata: Optional[Dict[str, str]] = None) -> str:
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()},
              path, metadata=metadata)
    return path


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def load_component_state(component_dir: str, filename: str
                         ) -> Dict[str, np.ndarray]:
    """State dict for one pipeline component, following a
    ``<filename>.index.json`` shard map if present (the format hub
    checkpoints >5 GB ship in — the real SVD UNet is 1.5B params fp32)."""
    import json
    import os
    path = os.path.join(component_dir, filename)
    index = path + ".index.json"
    if os.path.exists(index):
        with open(index) as f:
            weight_map = json.load(f)["weight_map"]
        sd: Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            sd.update(load_safetensors(os.path.join(component_dir, shard)))
        return sd
    return load_safetensors(path)


def load_diffusers_checkpoint(root: str, params: Tree, *,
                              clip_patch_size: int = 14,
                              components=("unet", "vae", "clip"),
                              shardings: Optional[Dict[str, Any]] = None,
                              ) -> Tree:
    """One-call pretrained-checkpoint loader (reference
    ``from_pretrained``, train_svd.py:643-656).

    ``root`` is a diffusers pipeline directory (``unet/``, ``vae/``,
    ``image_encoder/`` subdirs, plain or shard-indexed safetensors);
    ``params`` is the template tree from ``init_pipeline_params`` whose leaf
    dtypes define the dtype policy (fp32 checkpoint tensors are cast on HOST
    to the template dtype — bf16 halves the host->device transfer of the
    1.5B-param UNet — then ``device_put`` per component, optionally to
    ``shardings[component]`` (a tree or single sharding) for direct sharded
    placement on a mesh).

    Returns a new params dict; components absent from ``components`` keep
    their template values.
    """
    import os

    converted = dict(params)
    if "unet" in components:
        sd = load_component_state(os.path.join(root, "unet"),
                                  "diffusion_pytorch_model.safetensors")
        converted["unet"] = diffusers_to_flax(sd, params["unet"])
        del sd
    if "vae" in components:
        sd = load_component_state(os.path.join(root, "vae"),
                                  "diffusion_pytorch_model.safetensors")
        converted["vae"] = diffusers_to_flax(sd, params["vae"])
        del sd
    if "clip" in components:
        sd = load_component_state(os.path.join(root, "image_encoder"),
                                  "model.safetensors")
        converted["clip"] = clip_transformers_to_flax(
            sd, params["clip"], patch_size=clip_patch_size)
        del sd
    for name in components:
        shard = (shardings or {}).get(name)
        if shard is None:
            converted[name] = jax.device_put(converted[name])
        elif isinstance(shard, jax.sharding.Sharding):
            converted[name] = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, shard), converted[name])
        else:  # a tree of shardings matching the component tree
            converted[name] = jax.device_put(converted[name], shard)
    return converted
