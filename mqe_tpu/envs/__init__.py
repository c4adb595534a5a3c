from mqe_tpu.envs.registry import ENV_DICT, make_mqe_env  # noqa: F401
