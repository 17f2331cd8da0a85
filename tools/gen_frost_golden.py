"""Generate golden Go1 kinematics data from the reference FROST codegen.

Compiles the reference's Mathematica-generated FK/Jacobian sources
(src/go1_example/src/Expressions/*.cc) into a throwaway shared library and
samples them at random joint configurations. The resulting npz (committed at
tests/data/go1_frost_golden.npz) is the oracle for the analytic JAX
kinematics in decentralized_ekf_mhe_tpu/models/go1.py.

Run from the repo root with the reference mounted at /root/reference:
    python tools/gen_frost_golden.py
"""
import ctypes
import os
import subprocess
import tempfile

import numpy as np

REF = "/root/reference/src/go1_example"
WRAPPER = r"""
#define MATLAB_MEX_FILE 1
#include <cmath>
namespace SymFunction {
  void FR_foot_raw(double*, const double*);
  void FL_foot_raw(double*, const double*);
  void RR_foot_raw(double*, const double*);
  void RL_foot_raw(double*, const double*);
  void J_FR_raw(double*, const double*);
  void J_FL_raw(double*, const double*);
  void J_RR_raw(double*, const double*);
  void J_RL_raw(double*, const double*);
}
extern "C" {
void fk(int leg, double* o, const double* q) {
  switch(leg){
    case 0: SymFunction::FR_foot_raw(o,q); break;
    case 1: SymFunction::FL_foot_raw(o,q); break;
    case 2: SymFunction::RR_foot_raw(o,q); break;
    case 3: SymFunction::RL_foot_raw(o,q); break;
  }
}
void jac(int leg, double* o, const double* q) {
  switch(leg){
    case 0: SymFunction::J_FR_raw(o,q); break;
    case 1: SymFunction::J_FL_raw(o,q); break;
    case 2: SymFunction::J_RR_raw(o,q); break;
    case 3: SymFunction::J_RL_raw(o,q); break;
  }
}
}
"""


def build(tmp):
    objs = []
    for f in ["FR_foot", "FL_foot", "RR_foot", "RL_foot", "J_FR", "J_FL", "J_RR", "J_RL"]:
        o = os.path.join(tmp, f + ".o")
        subprocess.check_call(
            ["g++", "-DMATLAB_MEX_FILE=1", "-O2", "-fPIC", "-c",
             f"{REF}/src/Expressions/{f}.cc", "-o", o]
        )
        objs.append(o)
    w = os.path.join(tmp, "wrapper.cpp")
    with open(w, "w") as fh:
        fh.write(WRAPPER)
    wo = os.path.join(tmp, "wrapper.o")
    subprocess.check_call(["g++", "-O2", "-fPIC", "-c", w, "-o", wo])
    so = os.path.join(tmp, "libfrost.so")
    subprocess.check_call(["g++", "-shared", "-o", so] + objs + [wo])
    return ctypes.CDLL(so)


def main():
    with tempfile.TemporaryDirectory() as tmp:
        lib = build(tmp)

        def fk(leg, q22):
            out = np.zeros(3)
            q = np.ascontiguousarray(q22, dtype=np.float64)
            lib.fk(leg, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                   q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            return out

        def jac(leg, q22):
            out = np.zeros(66)
            q = np.ascontiguousarray(q22, dtype=np.float64)
            lib.jac(leg, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                    q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
            # column-major (3,22); per-leg 3x3 block at cols 6+leg*4..+2
            return out.reshape(22, 3).T

        rng = np.random.default_rng(42)
        n = 256
        # joint ranges approx Go1 limits: abad ±0.86, thigh -0.68..4.5, knee -2.8..-0.9
        joints = np.stack(
            [
                rng.uniform(-0.86, 0.86, (n, 4)),
                rng.uniform(-0.68, 3.9, (n, 4)),
                rng.uniform(-2.7, -0.92, (n, 4)),
            ],
            axis=-1,
        )  # (n, 4 legs, 3 joints)
        fk_out = np.zeros((n, 4, 3))
        jac_out = np.zeros((n, 4, 3, 3))
        for i in range(n):
            q22 = np.zeros(22)
            for leg in range(4):
                q22[6 + leg * 4: 6 + leg * 4 + 3] = joints[i, leg]
            for leg in range(4):
                fk_out[i, leg] = fk(leg, q22)
                J = jac(leg, q22)
                jac_out[i, leg] = J[:, 6 + leg * 4: 6 + leg * 4 + 3]
        np.savez_compressed(
            "tests/data/go1_frost_golden.npz",
            joints=joints, fk=fk_out, jac=jac_out,
        )
        print("wrote tests/data/go1_frost_golden.npz", joints.shape)


if __name__ == "__main__":
    main()
