from .config import Params
from .meters import AverageMeter

__all__ = ["Params", "AverageMeter"]
