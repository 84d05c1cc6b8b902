from .stream_state import StreamState, init_stream_state, update_stream_state
from .host_state import HostState

__all__ = ["StreamState", "init_stream_state", "update_stream_state", "HostState"]
