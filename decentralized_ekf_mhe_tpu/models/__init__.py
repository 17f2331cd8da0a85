from decentralized_ekf_mhe_tpu.models.base import LegKinematics, RobotModel  # noqa: F401
from decentralized_ekf_mhe_tpu.models.go1 import Go1Model  # noqa: F401
from decentralized_ekf_mhe_tpu.models.cassie import CassieModel  # noqa: F401
from decentralized_ekf_mhe_tpu.models.pogox import PogoXModel  # noqa: F401

REGISTRY = {
    "go1": Go1Model,
    "cassie": CassieModel,
    "pogox": PogoXModel,
}


def get_model(name: str, **kwargs):
    return REGISTRY[name](**kwargs)
