"""Shared test fixtures: a tiny DC-VIC config for fast CPU tests."""
from dc_vic_tpu.utils.config import Config


def tiny_config(use_charm=True, use_beta=True, n_embed=32):
    model_type = {
        (True, True): "HyperpriorCharmDualCondVicModel",
        (True, False): "HyperpriorCharmVicModel",
        (False, True): "HyperpriorDualCondVicModel",
        (False, False): "HyperpriorVicModel",
    }[(use_charm, use_beta)]

    enc = {
        "type": "ElicDualBetaFtVqScEncoder" if use_beta else "ElicVqCatScEncoder",
        "in_ch": 3, "out_ch": 24, "main_ch": 16, "block_mid_ch": 8,
        "num_blocks": 1,
    }
    dec = {
        "type": ("ElicDualBetaFtFeatFusionDecoder" if use_beta
                 else "ElicFeatFusionDecoder"),
        "out_ch": 3, "main_ch": 16, "block_mid_ch": 8, "num_blocks": 1,
        "use_tanh": False, "feat_layer_name": "block1",
        "fusion_layer_dict": {"block1": "block_1_8", "block2": "block_1_4",
                              "block3": "block_1_2"},
    }
    if use_beta:
        for d in (enc, dec):
            d.update(max_beta_1=3.0, max_beta_2=3.5, cond_ch=16, L=4,
                     use_pi=False, include_x=True)

    cfg = {
        "model": {
            "type": model_type,
            "enc_vq_input": "onehot_indices",
            "use_selected_beta_pairs": True,
            "selected_beta_rate": [2.29, 1.12, 0.16],
            "selected_beta_vq": [3.0, 2.0, 1.0],
        },
        "subnet": {
            "encoder": enc,
            "decoder": dec,
            "hyperencoder": {"type": "Minnen20HyperEncoder", "bottleneck_z": 16},
            # charm: free width; non-charm: must be 2*bottleneck_y (mean+scale)
            "hyperdecoder": {"type": "Minnen20HyperDecoder",
                             "hyper_out_ch": 32 if use_charm else 48},
            "context_model": {"type": "Minnen20CharmContextModel",
                              "num_slices": 6, "max_support_slices": 4,
                              "slice_mid_ch": (16, 16)},
            "entropy_model_z": {"type": "SteEntropyBottleneck", "channels": 16},
            "entropy_model_y": {"type": "SteGaussianMeanScaleConditional",
                                "scale_bound": 0.11},
            "fusion_module": {
                "fuse_type": "sft",
                "fuse_scedule_dict": {
                    "block_1_8": {"dec_ch": 16, "cond_ch": 16, "mid_ch": 16},
                    "block_1_4": {"dec_ch": 8, "cond_ch": 16, "mid_ch": 8},
                    "block_1_2": {"dec_ch": 8, "cond_ch": 16, "mid_ch": 8},
                },
            },
            "vq_estimator": {"type": "DualBlockSwinVqEstimator",
                             "main_ch": 16, "num_swin_blocks": 1,
                             "blk_depth": 1, "num_heads": 2, "window_size": 4,
                             "use_upsample": False},
            "vq_model": {
                "ckpt_path": None, "embed_dim": 4, "n_embed": n_embed,
                "ddconfig": {"double_z": False, "z_channels": 4,
                             "resolution": 64, "in_channels": 3, "out_ch": 3,
                             "ch": 8, "ch_mult": [1, 1, 1, 2],
                             "num_res_blocks": 1, "attn_resolutions": [8],
                             "dropout": 0.0},
            },
        },
    }
    return Config._wrap(cfg)
