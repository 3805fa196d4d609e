from .config import Config, apply_cli_overrides, dump_config, load_config
from .logger import AvgMeter, CSVLogger, bolded_log, get_root_logger, log_dict_items
from .paths import PathHandler, iter2str
from .registry import (
    CONTEXTMODEL_REGISTRY,
    DATASET_REGISTRY,
    DECODER_REGISTRY,
    DISCRIMINATOR_REGISTRY,
    ENCODER_REGISTRY,
    ENTROPYMODEL_REGISTRY,
    HYPERDECODER_REGISTRY,
    HYPERENCODER_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
    OPTIMIZER_REGISTRY,
    Registry,
    SCHEDULER_REGISTRY,
    TRAINER_REGISTRY,
    VQ_ESTIMATOR_REGISTRY,
    VQ_FUSION_REGISTRY,
)
from .timer import Timer
