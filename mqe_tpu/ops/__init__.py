from mqe_tpu.ops import quat  # noqa: F401
