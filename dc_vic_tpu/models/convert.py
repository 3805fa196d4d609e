"""PyTorch -> JAX weight conversion for the released DC-VIC artifacts.

Maps the reference's checkpoint state_dicts (`dc_vic_*.pth.tar` with key
'comp_model', ref: src/models/comp_model/base_model.py:106-130, and the
CompVis VQGAN `vq-f8-n256.ckpt` Lightning 'state_dict', ref:
src/models/vq_vae_builder.py:10-23) onto this package's flax parameter trees.

Tensor transforms:
  Conv2d           OIHW          -> HWIO
  ConvTranspose2d  (I, O, kH, kW) -> flip(kH, kW) then (kH, kW, I, O)
  Linear / 1x1-conv-as-Dense  (O, I[,1,1]) -> (I, O)
  Norm weight/bias -> scale/bias; embeddings direct.

The key mapping is expressed as flax-path -> torch-key rules, so the same
table drives conversion in both directions; tests round-trip a synthetic
torch-layout state dict through convert() to validate the mapping without
the (undistributable) released weights.
"""
from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
from flax import traverse_util


# --------------------------------------------------------------------------
# tensor transforms (torch -> jax)
# --------------------------------------------------------------------------

def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))          # OIHW -> HWIO


def t_conv_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))


def t_deconv(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (I, O, kH, kW); our DeconvTorch is a
    # correlation over the dilated input -> flip spatially, layout HWIO.
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1))


def t_deconv_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1]


def t_dense(w: np.ndarray) -> np.ndarray:
    w = np.asarray(w)
    if w.ndim == 4:  # 1x1 conv used as Dense
        w = w[:, :, 0, 0]
    return np.transpose(w, (1, 0))


def t_dense_inv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def t_id(w: np.ndarray) -> np.ndarray:
    return np.asarray(w)


TRANSFORMS = {
    "conv": (t_conv, t_conv_inv),
    "deconv": (t_deconv, t_deconv_inv),
    "dense": (t_dense, t_dense_inv),
    "id": (t_id, t_id),
}


# --------------------------------------------------------------------------
# path translation:  flax param path (tuple of str) -> (torch key, transform)
# --------------------------------------------------------------------------

def _swin_block(parts: List[str], base: str) -> Optional[Tuple[str, str]]:
    """vq_estimator/RSTB_i/SwinBlock_j/... ->
    swin_blks.{i}.residual_group.blocks.{j}...."""
    # parts starts after SwinBlock_j
    leaf = parts[-1]
    dense_tf = "id" if leaf == "bias" else "dense"
    if parts[0].startswith("WindowAttention"):
        if leaf == "rel_pos_bias":
            return f"{base}.attn.relative_position_bias_table", "id"
        name = parts[1]
        tk = {"qkv": "attn.qkv", "proj": "attn.proj"}[name]
        return f"{base}.{tk}.{_wb(leaf)}", dense_tf
    if parts[0] == "LayerNorm_0":
        return f"{base}.norm1.{_wb(leaf)}", "id"
    if parts[0] == "LayerNorm_1":
        return f"{base}.norm2.{_wb(leaf)}", "id"
    if parts[0] == "Dense_0":
        return f"{base}.mlp.fc1.{_wb(leaf)}", dense_tf
    if parts[0] == "Dense_1":
        return f"{base}.mlp.fc2.{_wb(leaf)}", dense_tf
    return None


def _wb(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight", "bias": "bias",
            "embedding": "weight"}.get(leaf, leaf)


def _tf_for(leaf: str, kind: str) -> str:
    if leaf == "bias" or leaf == "scale" or kind == "norm":
        return "id"
    return kind


class PathMapper:
    """Translates one flax path into (torch_key, transform_name).

    Handles the wrapper-module nesting this package uses (Conv -> nn.Conv as
    'Conv_0', etc.). Unknown paths raise so gaps are loud.
    """

    def __init__(self, torch_prefixes: Optional[Dict[str, str]] = None):
        # flax top-level -> torch top-level
        self.roots = {
            "encoder": "encoder",
            "decoder": "decoder",
            "hyperencoder": "hyperencoder",
            "hyperdecoder": "hyperdecoder",
            "context_model": "context_model",
            "entropy_z": "entropy_model_z",
            "vq_estimator": "vq_estimator",
            "vq_model": "vq_model",
            "fused_decoder": None,  # split: fusion_* vs vq_model.decoder
        }
        if torch_prefixes:
            self.roots.update(torch_prefixes)

    # -- helpers ------------------------------------------------------------
    def _conv_leaf(self, parts: List[str], torch_name: str,
                   kind: str = "conv") -> Tuple[str, str]:
        """parts = [...,'Conv_0','kernel'] under our Conv/DeconvTorch wrapper."""
        leaf = parts[-1]
        return f"{torch_name}.{_wb(leaf)}", ("id" if leaf == "bias" else kind)

    def _bottleneck_blocks(self, parts: List[str], base: str) -> Tuple[str, str]:
        """ResidualBottleneckBlocks: BottleneckResBlock_i/Conv_j/Conv_0/leaf ->
        {base}.block{i}.conv.{0,2,4}."""
        m = re.match(r"BottleneckResBlock_(\d+)", parts[0])
        i = int(m.group(1))
        j = int(re.match(r"Conv_(\d+)", parts[1]).group(1))
        seq = {0: 0, 1: 2, 2: 4}[j]
        return self._conv_leaf(parts, f"{base}.block{i}.conv.{seq}")

    def _nlam(self, parts: List[str], base: str) -> Tuple[str, str]:
        """ChengNLAM: NLAMResBlock_0..2 = trunk, _3.._5 = attention,
        Conv_0 = final 1x1. Each NLAMResBlock has Conv_0..2 -> c1..c3."""
        if parts[0].startswith("NLAMResBlock"):
            i = int(parts[0].split("_")[1])
            group = "trunk_block" if i < 3 else "attention_block"
            j = int(re.match(r"Conv_(\d+)", parts[1]).group(1))
            return self._conv_leaf(
                parts, f"{base}.{group}.{i % 3}.c{j + 1}")
        if parts[0] == "Conv_0":
            return self._conv_leaf(parts, f"{base}.conv")
        raise KeyError(parts)

    def _beta_ss(self, parts: List[str], base: str) -> Tuple[str, str]:
        """BetaScaleShift: Dense_0=shared.0, Dense_1=scale, Dense_2=shift
        (the reference uses 1x1 convs on a [1,C,1,1] map)."""
        name = {"Dense_0": "shared.0", "Dense_1": "scale",
                "Dense_2": "shift"}[parts[0]]
        return f"{base}.{name}.{_wb(parts[-1])}", \
            ("id" if parts[-1] == "bias" else "dense")

    def _beta_mlp(self, parts: List[str], base: str) -> Tuple[str, str]:
        name = {"Dense_0": "mlp.0", "Dense_1": "mlp.2"}[parts[0]]
        return f"{base}.{name}.{_wb(parts[-1])}", \
            ("id" if parts[-1] == "bias" else "dense")

    def _gn_resblock_codeformer(self, parts: List[str], base: str
                                ) -> Tuple[str, str]:
        """codeformer-style ResBlock (FuseSftBlock.fuse_block): norm1/conv1/
        norm2/conv2/conv_out."""
        p0 = parts[0]
        if p0 == "GroupNorm_0":
            return f"{base}.norm1.{_wb(parts[-1])}", "id"
        if p0 == "GroupNorm_1":
            return f"{base}.norm2.{_wb(parts[-1])}", "id"
        if p0 == "Conv_0":
            return self._conv_leaf(parts, f"{base}.conv1")
        if p0 == "Conv_1":
            return self._conv_leaf(parts, f"{base}.conv2")
        if p0 == "Conv_2":
            return self._conv_leaf(parts, f"{base}.conv_out")
        raise KeyError(parts)

    def _gn_resblock_femasr(self, parts: List[str], base: str
                            ) -> Tuple[str, str]:
        """femasr-style ResBlock (estimator): conv = Sequential[norm,act,conv,
        norm,act,conv] -> indices 0,2,3,5."""
        p0 = parts[0]
        if p0 == "GroupNorm_0":
            return f"{base}.conv.0.norm.{_wb(parts[-1])}", "id"
        if p0 == "GroupNorm_1":
            return f"{base}.conv.3.norm.{_wb(parts[-1])}", "id"
        if p0 == "Conv_0":
            return self._conv_leaf(parts, f"{base}.conv.2")
        if p0 == "Conv_1":
            return self._conv_leaf(parts, f"{base}.conv.5")
        raise KeyError(parts)

    def _fuse_sft(self, parts: List[str], base: str) -> Tuple[str, str]:
        p0 = parts[0]
        if p0.startswith("GNResBlock"):
            return self._gn_resblock_codeformer(parts[1:], f"{base}.fuse_block")
        # scale path: Conv_0, Conv_1 ; shift: Conv_2, Conv_3
        j = int(re.match(r"Conv_(\d+)", p0).group(1))
        branch = "scale" if j < 2 else "shift"
        seq = {0: 0, 1: 2, 2: 0, 3: 2}[j]
        return self._conv_leaf(parts, f"{base}.{branch}.{seq}")

    def _vqgan_block(self, parts: List[str], base: str) -> Tuple[str, str]:
        """VQResnetBlock / VQAttnBlock / Up/Downsample leaf naming matches the
        reference ddconfig modules directly (norm1, conv1, q, k, v, ...)."""
        name = parts[0]
        leaf = parts[-1]
        if name.startswith("norm"):
            return f"{base}.{name}.{_wb(leaf)}", "id"
        if name in ("q", "k", "v", "proj_out", "conv_in", "conv_out",
                    "conv1", "conv2", "nin_shortcut", "conv"):
            return self._conv_leaf(parts, f"{base}.{name}")
        raise KeyError(parts)

    def _vqgan_tree(self, parts: List[str], base: str) -> Tuple[str, str]:
        """VQEncoder/VQDecoder children: down_{l}_block_{b} etc."""
        name = parts[0]
        m = re.match(r"(down|up)_(\d+)_(block|attn)_(\d+)", name)
        if m:
            d, l, kind, b = m.groups()
            return self._vqgan_block(parts[1:], f"{base}.{d}.{l}.{kind}.{b}")
        m = re.match(r"(down|up)_(\d+)_(downsample|upsample)", name)
        if m:
            d, l, kind = m.groups()
            return self._vqgan_block(parts[1:], f"{base}.{d}.{l}.{kind}")
        m = re.match(r"mid_(block_\d|attn_\d)", name)
        if m:
            return self._vqgan_block(parts[1:], f"{base}.mid.{m.group(1)}")
        if name == "norm_out":
            return f"{base}.norm_out.{_wb(parts[-1])}", "id"
        if name in ("conv_in", "conv_out"):
            return self._conv_leaf(parts, f"{base}.{name}")
        raise KeyError(parts)

    # -- main dispatch --------------------------------------------------------
    def map_path(self, path: Tuple[str, ...]) -> Tuple[str, str]:
        parts = list(path)
        if parts[0] == "params":
            parts = parts[1:]
        root = parts[0]
        rest = parts[1:]
        leaf = parts[-1]

        # ---------------- entropy bottleneck -------------------------------
        if root == "entropy_z":
            name = rest[0]
            m = re.match(r"(matrix|bias|factor)_(\d+)", name)
            if m:
                return f"entropy_model_z._{m.group(1)}{m.group(2)}", "id"
            if name == "quantiles":
                return "entropy_model_z.quantiles", "id"
            raise KeyError(path)

        # ---------------- encoder / decoder (ELIC) -------------------------
        if root in ("encoder", "decoder"):
            name = rest[0]
            base = root
            if name == "beta_mlp":
                return self._beta_mlp(rest[1:], base)
            if name == "layers":   # decoder wrapper (_ElicDecoderLayers)
                return self.map_path(tuple([root] + rest[1:]))
            m = re.match(r"beta_ft_(\d+)", name)
            if m:
                return self._beta_ss(rest[1:], f"{base}.beta_ft_list.{m.group(1)}")
            if name == "init_fuse":
                return self._beta_ss(rest[1:], f"{base}.init_fuse")
            if name in ("conv1", "conv2", "conv3", "conv4", "projection"):
                kind = "conv"
                if root == "decoder" and name.startswith("conv"):
                    kind = "deconv"   # decoder upsampling convs are transposed
                return self._conv_leaf(rest, f"{base}.{name}", kind)
            if name.startswith("block"):
                return self._bottleneck_blocks(rest[1:], f"{base}.{name}")
            if name.startswith("attn"):
                return self._nlam(rest[1:], f"{base}.{name}")
            # decoder up_conv wrappers are anonymous DeconvTorch_i children
            m = re.match(r"DeconvTorch_(\d+)", name)
            if m:
                conv_i = int(m.group(1)) + 1
                return self._conv_leaf(rest, f"{base}.conv{conv_i}", "deconv")
            m = re.match(r"PixelShuffleUp_(\d+)", name)
            if m:
                conv_i = int(m.group(1)) + 1
                return self._conv_leaf(rest, f"{base}.conv{conv_i}.0", "conv")
            m = re.match(r"ResidualBottleneckBlocks_(\d+)", name)
            if m:
                blk_i = int(m.group(1)) + 1
                return self._bottleneck_blocks(rest[1:], f"{base}.block{blk_i}")
            m = re.match(r"ChengNLAM_(\d+)", name)
            if m:
                return self._nlam(rest[1:], f"{base}.attn2")
            raise KeyError(path)

        # ---------------- hyperprior ---------------------------------------
        if root == "hyperencoder":
            return self._conv_leaf(rest, f"hyperencoder.{rest[0]}")
        if root == "hyperdecoder":
            tower = rest[0]  # hd_mu / hd_std
            conv = rest[1]
            kind = "deconv" if conv in ("conv1", "conv2") else "conv"
            return self._conv_leaf(rest, f"hyperdecoder.{tower}.{conv}", kind)

        # ---------------- ChARM context model ------------------------------
        if root == "context_model":
            m = re.match(r"(mean|scale|lrp)_(\d+)", rest[0])
            group = {"mean": "mean_slice_transforms",
                     "scale": "scale_slice_transforms",
                     "lrp": "lrp_slice_transforms"}[m.group(1)]
            seq = {"conv1": 0, "conv2": 2, "conv3": 4}[rest[1]]
            return self._conv_leaf(
                rest, f"context_model.{group}.{m.group(2)}.model.{seq}")

        # ---------------- Swin VQ estimator --------------------------------
        if root == "vq_estimator":
            name = rest[0]
            base = "vq_estimator"
            m = re.match(r"Conv_(\d+)", name)
            if m:
                # Conv_0 = first_block.0, Conv_1 = first_block.4,
                # Conv_2 = out_block.1  (in compact creation order)
                tk = {0: "first_block.0", 1: "first_block.4",
                      2: "out_block.1"}[int(m.group(1))]
                return self._conv_leaf(rest, f"{base}.{tk}")
            if name == "embed_projection":
                return self._conv_leaf(rest, f"{base}.embed_projection")
            m = re.match(r"GNResBlock_(\d+)", name)
            if m:
                # 0,1 -> first_block.2/.3 ; 2 -> out_block.0
                tk = {0: "first_block.2", 1: "first_block.3",
                      2: "out_block.0"}[int(m.group(1))]
                return self._gn_resblock_femasr(rest[1:], f"{base}.{tk}")
            m = re.match(r"RSTB_(\d+)", name)
            if m:
                i = int(m.group(1))
                inner = rest[1]
                mm = re.match(r"SwinBlock_(\d+)", inner)
                if mm:
                    j = int(mm.group(1))
                    out = _swin_block(
                        rest[2:],
                        f"{base}.swin_blks.{i}.residual_group.blocks.{j}")
                    if out is None:
                        raise KeyError(path)
                    return out
                if inner == "Conv_0":
                    return self._conv_leaf(rest, f"{base}.swin_blks.{i}.conv")
            raise KeyError(path)

        # ---------------- frozen VQGAN --------------------------------------
        if root == "vq_model":
            name = rest[0]
            if name == "encoder":
                return self._vqgan_tree(rest[1:], "vq_model.encoder")
            if name == "decoder":
                return self._vqgan_tree(rest[1:], "vq_model.decoder")
            if name == "quantize":
                return "vq_model.quantize.embedding.weight", "id"
            if name == "quant_conv":
                return f"vq_model.quant_conv.{_wb(rest[-1])}", \
                    ("id" if rest[-1] == "bias" else "dense")
            if name == "post_quant_conv":
                return f"vq_model.post_quant_conv.{_wb(rest[-1])}", \
                    ("id" if rest[-1] == "bias" else "dense")
            raise KeyError(path)

        # ---------------- fused decoder (VQGAN decoder + fusion taps) -------
        if root == "fused_decoder":
            name = rest[0]
            m = re.match(r"fusion_(.+)", name)
            if m:
                return self._fuse_sft(
                    rest[1:],
                    f"fusion_module.fusion_modules.{m.group(1)}")
            return self._vqgan_tree(rest, "vq_model.decoder")

        raise KeyError(path)


# --------------------------------------------------------------------------
# conversion drivers
# --------------------------------------------------------------------------

def convert_state_dict(torch_sd: Dict[str, np.ndarray], flax_template,
                       mapper: Optional[PathMapper] = None,
                       strict: bool = False):
    """torch state dict -> flax params matching flax_template's tree.

    Returns (params, report) where report lists unmatched keys on both sides.
    Non-strict mode keeps the template's value for missing torch keys (the
    reference loader is also non-strict, ref: base_model.py:118-126).
    """
    mapper = mapper or PathMapper()
    flat = traverse_util.flatten_dict(flax_template)
    out = {}
    used = set()
    missing: List[str] = []
    for path, template_leaf in flat.items():
        try:
            tkey, tf_name = mapper.map_path(path)
        except KeyError:
            missing.append("/".join(path) + " (no mapping)")
            out[path] = template_leaf
            continue
        if tkey not in torch_sd:
            missing.append(f"{'/'.join(path)} -> {tkey}")
            out[path] = template_leaf
            continue
        w = TRANSFORMS[tf_name][0](np.asarray(torch_sd[tkey]))
        tshape = tuple(getattr(template_leaf, "shape", np.shape(template_leaf)))
        if tuple(w.shape) != tshape:
            raise ValueError(
                f"shape mismatch for {tkey}: torch->{w.shape}, flax {tshape}")
        dtype = getattr(template_leaf, "dtype", np.float32)
        out[path] = w.astype(dtype)
        used.add(tkey)

    unused = [k for k in torch_sd
              if k not in used and not k.endswith(
                  ("_quantized_cdf", "_offset", "_cdf_length", "scale_table",
                   "target"))]
    report = dict(missing=missing, unused=unused)
    if strict and (missing or unused):
        raise ValueError(f"conversion incomplete: {report}")
    return traverse_util.unflatten_dict(out), report


def export_state_dict(flax_params, mapper: Optional[PathMapper] = None
                      ) -> Dict[str, np.ndarray]:
    """Inverse conversion (JAX -> torch layout); used to round-trip-test the
    mapping and to export trained weights for the reference tooling."""
    mapper = mapper or PathMapper()
    flat = traverse_util.flatten_dict(flax_params)
    out: Dict[str, np.ndarray] = {}
    for path, leaf in flat.items():
        tkey, tf_name = mapper.map_path(path)
        out[tkey] = TRANSFORMS[tf_name][1](np.asarray(leaf))
    return out


def _strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Old DataParallel checkpoints prefix keys with 'module.'
    (ref: base_model.py:112-117)."""
    return {k[7:] if k.startswith("module.") else k: v for k, v in sd.items()}


def load_torch_comp_model(path: str, flax_template, spec=None,
                          strict: bool = False):
    """Load a released DC-VIC checkpoint (.pth.tar, dict key 'comp_model')."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("comp_model", ckpt)
    sd = _strip_module_prefix(
        {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()})
    params, report = convert_state_dict(sd, flax_template, strict=strict)
    return params


def load_torch_vqgan(path: str, flax_template):
    """Load a CompVis VQGAN checkpoint (Lightning 'state_dict', loss.* keys
    dropped, ref: src/models/vq_vae_builder.py:10-23) into a standalone
    VQModel parameter tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {f"vq_model.{k}": (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items() if not k.startswith("loss.")}
    mapper = PathMapper()
    params, report = convert_state_dict(sd, flax_template, mapper)
    return params
