from .meters import AverageMeter
from .metrics import accuracy, actnet_acc, mean_average_precision
from .flops import flops_computation, MAIN_FLOPS, POLICY_FLOPS, count_model_flops

__all__ = [
    "AverageMeter",
    "accuracy",
    "actnet_acc",
    "mean_average_precision",
    "flops_computation",
    "MAIN_FLOPS",
    "POLICY_FLOPS",
    "count_model_flops",
]
