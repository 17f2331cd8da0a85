from decentralized_ekf_mhe_tpu.utils import quaternion  # noqa: F401
