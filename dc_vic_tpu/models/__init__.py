"""Model factory: reference-compatible YAML config -> flax model + codec spec
(ref: src/models/__init__.py build_comp_model)."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

from ..utils.registry import MODEL_REGISTRY
from . import alt_autoencoders  # noqa: F401  (register alternatives)
from . import subnets  # noqa: F401  (register subnets)
from .dc_vic import DCVICModel, SPLIT_DECODE_RESOLUTION, STRIDE, pad_image, crop_image
from .vqgan import VQDecoder, VQEncoder, VQModel, VectorQuantizer

_DROP = {"type"}


def _clean(cfg: Optional[Dict], drop=()) -> Dict:
    out = dict(cfg or {})
    for k in set(drop) | _DROP:
        out.pop(k, None)
    return out


@dataclasses.dataclass
class CompModelSpec:
    """A built model plus the host-side codec metadata that does not belong
    in the jitted graph (quality-level beta tables, checkpoint paths)."""
    module: DCVICModel
    selected_beta_rate: Optional[List[float]] = None
    selected_beta_vq: Optional[List[float]] = None
    max_beta_rate: float = 3.0
    max_beta_vq: float = 3.5
    num_beta_levels: int = 100
    use_selected_beta_pairs: bool = False
    vq_ckpt_path: Optional[str] = None

    def quality_betas(self, quality_ind: int):
        assert self.selected_beta_rate is not None
        return (self.selected_beta_rate[quality_ind],
                self.selected_beta_vq[quality_ind])

    @property
    def num_quality_levels(self) -> int:
        return len(self.selected_beta_rate or [])


def build_comp_model(opt, dtype=None) -> CompModelSpec:
    """opt: full experiment config (needs opt.model and opt.subnet)."""
    # Validate the numeric-mode knobs here (a typo'd YAML value would
    # otherwise surface only at first trace as an opaque XLA precision
    # error — ADVICE r4).
    ep = opt.get("entropy_precision", "high")
    if ep not in (None, "high", "highest", "default"):
        raise ValueError(
            f"entropy_precision={ep!r}: expected 'high' (faithful-f32 "
            "3-pass decomposition, required for compressai/CPU-parity "
            "streams), 'highest', or 'default' (single-pass bf16 — the "
            "fast TPU mode, scoped to the tpu stream format)")
    cd = opt.get("codec_dtype")
    if cd not in (None, "bfloat16", "float32"):
        raise ValueError(
            f"codec_dtype={cd!r}: expected 'bfloat16' or 'float32'/null")
    model_cfg = dict(opt["model"])
    model_type = model_cfg.pop("type")
    use_charm = "Charm" in model_type
    use_beta = "DualCond" in model_type

    sub = opt["subnet"]
    enc = dict(sub["encoder"])
    dec = dict(sub["decoder"])
    vq = dict(sub["vq_model"])
    ddconfig = dict(vq.get("ddconfig") or {})

    enc_kw = _clean(enc, drop=("in_ch", "input_feat_ch", "proj_init",
                               "proj_init_std"))
    dec_kw = _clean(dec, drop=("in_ch",))
    dec_kw["fusion_layer_dict"] = dict(dec_kw.get("fusion_layer_dict") or {})
    if "feat_layer_name" in dec_kw:
        pass
    # null max_beta in base configs means "set by the experiment config"
    for kw in (enc_kw, dec_kw):
        for k in ("max_beta_1", "max_beta_2"):
            if k in kw and kw[k] is None:
                if use_beta:
                    raise ValueError(f"{k} must be set for dual-cond models")
                kw.pop(k)
    if not use_beta:
        for kw in (enc_kw, dec_kw):
            for k in ("max_beta_1", "max_beta_2", "cond_ch", "L", "use_pi",
                      "include_x"):
                kw.pop(k, None)

    hyperenc = _clean(sub.get("hyperencoder"), drop=("bottleneck_y",))
    hyperdec = _clean(sub.get("hyperdecoder"), drop=("bottleneck_z",))

    ctx = _clean(sub.get("context_model"), drop=("bottleneck_y",)) \
        if use_charm else None

    est = _clean(sub.get("vq_estimator"),
                 drop=("in_ch", "input_resolution", "n_embed", "embed_dim"))

    fusion = dict(sub.get("fusion_module") or {})
    sched = {
        k: {"mid_ch": v.get("mid_ch", v["dec_ch"])}
        for k, v in dict(fusion.get("fuse_scedule_dict") or {}).items()
    }

    ez = dict(sub.get("entropy_model_z") or {})
    ey = dict(sub.get("entropy_model_y") or {})

    module = DCVICModel(
        encoder_type=enc["type"],
        encoder_cfg=enc_kw,
        decoder_type=dec["type"],
        decoder_cfg=dec_kw,
        hyperencoder_type=sub["hyperencoder"]["type"],
        hyperencoder_cfg=hyperenc,
        hyperdecoder_type=sub["hyperdecoder"]["type"],
        hyperdecoder_cfg=hyperdec,
        context_cfg=ctx,
        vq_estimator_cfg=est,
        fuse_schedule=sched,
        fuse_type=fusion.get("fuse_type", "sft"),
        ddconfig=ddconfig,
        n_embed=vq.get("n_embed", 256),
        embed_dim=vq.get("embed_dim", 4),
        bottleneck_y=enc.get("out_ch", 192),
        bottleneck_z=ez.get("channels", 192),
        scale_bound=ey.get("scale_bound", 0.11),
        enc_vq_input=model_cfg.get("enc_vq_input", "onehot_indices"),
        enc_input_vq_recon=model_cfg.get("enc_input_vq_recon", False),
        convert_img_range_to_01=opt.get("convert_img_range_to_01", False),
        use_charm=use_charm,
        use_beta=use_beta,
        gumbel_sampling=model_cfg.get("gumbel_sampling", False),
        dtype=dtype,
        codec_dtype=opt.get("codec_dtype"),
        entropy_precision=opt.get("entropy_precision", "high"),
    )

    max_b1 = enc_kw.get("max_beta_1", 3.0) if use_beta else 0.0
    max_b2 = enc_kw.get("max_beta_2", 3.5) if use_beta else 0.0
    return CompModelSpec(
        module=module,
        selected_beta_rate=model_cfg.get("selected_beta_rate"),
        selected_beta_vq=model_cfg.get("selected_beta_vq"),
        max_beta_rate=max_b1,
        max_beta_vq=max_b2,
        num_beta_levels=model_cfg.get("num_beta_levels", 100),
        use_selected_beta_pairs=model_cfg.get("use_selected_beta_pairs", False),
        vq_ckpt_path=vq.get("ckpt_path"),
    )
