"""Training entry point (ref: scripts/train.py:16-27).

Usage: python scripts/train.py --config_path config/exp1_stage1_1.yaml \
           [key.subkey=value ...]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dc_vic_tpu.train.trainer import build_trainer
from dc_vic_tpu.utils.config import dump_config, load_config
from dc_vic_tpu.utils.logger import get_root_logger
from dc_vic_tpu.utils.paths import PathHandler


def main():
    from dc_vic_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    p = argparse.ArgumentParser()
    p.add_argument("--config_path", type=str, required=True)
    p.add_argument("overrides", nargs="*", help="key.subkey=value overrides")
    args = p.parse_args()

    opt = load_config(args.config_path, overrides=args.overrides,
                      is_train=True)
    paths = PathHandler(opt.get("ckpt_root", "./checkpoint"), opt["exp"])
    paths.make_job_dir()
    dump_config(opt, paths.config_dump_path)
    logger = get_root_logger(paths.log_path)
    logger.info(f"experiment: {opt['exp']}")

    trainer = build_trainer(opt)
    if opt.get("dry_run"):
        logger.info("dry_run: model built, exiting")
        return
    trainer.train_loop()


if __name__ == "__main__":
    main()
