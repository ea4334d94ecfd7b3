from tokcodec.state.broadcast import Broadcast  # noqa: F401
