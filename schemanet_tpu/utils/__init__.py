from .config import apply_overrides, get_cfg, parse_override_strings, resolve_subconfig
from .logging_utils import TBWriter, setup_logger
from .metrics import (
    AverageMeter,
    DictAverageMeter,
    count_parameters,
    tensor_dict_items,
    topk_accuracy,
)
from .profiling import StepTimer, block_tree, trace
from .registry import Registry
from .seed import make_deterministic

__all__ = [
    "AverageMeter",
    "DictAverageMeter",
    "Registry",
    "StepTimer",
    "TBWriter",
    "apply_overrides",
    "block_tree",
    "count_parameters",
    "get_cfg",
    "make_deterministic",
    "parse_override_strings",
    "resolve_subconfig",
    "setup_logger",
    "tensor_dict_items",
    "topk_accuracy",
    "trace",
]
