from .host_ops import (
    center_events,
    shift_events,
    hflip_events,
    tflip_events,
    gather_event_windows,
)

__all__ = [
    "center_events",
    "shift_events",
    "hflip_events",
    "tflip_events",
    "gather_event_windows",
]
