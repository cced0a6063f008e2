"""Low-SNR A2 diagnosis, part 2: init vs objective.

If ADMM started AT THE TRUTH still walks away to ~0 dB, the magnitude-LS
objective itself is the low-SNR limiter; if truth-init holds a good
solution, the spectral init's noise collapse is the limiter and a sparse
(PLOMP) init is a deployable fix.

Variants: spectral (control) / truth-init (oracle bound) / plomp-init
(deployable hybrid: stage-1 sparse recovery seeds every ADMM column).
"""
import dataclasses
import json
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import twoace_tpu as t2
from twoace_tpu.config import AdmmConfig, MethodFlags
from twoace_tpu.models import (generate_channel, generate_measurement,
                               sparse_formulation)
from twoace_tpu.ops import admm as admm_mod
from twoace_tpu.ops.dispatch import recover_sparse
from twoace_tpu.sensing import generate_sensing_matrix
from twoace_tpu.utils.metrics import nmse_h_projection

NT = int(sys.argv[1]) if len(sys.argv) > 1 else 8
M = int(sys.argv[2]) if len(sys.argv) > 2 else 150
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
SEARCH = 95.0
PATHS = 3
SNRS = [0.0, 5.0, 10.0]

orig_spectral = admm_mod.spectral_initialize


def make_init_override(x_seed):
    """spectral_initialize stand-in: every column = seed + small jitter."""
    def init(a, b, r, method="subspace", eig_backend="jacobi", key=None):
        r = min(r, a.shape[0], a.shape[1])
        base = jnp.tile(x_seed[:, None], (1, r))
        if key is not None:
            k1, k2 = jax.random.split(key)
            jit_ = (jax.random.normal(k1, base.shape) +
                    1j * jax.random.normal(k2, base.shape))
            base = base + 0.05 * jnp.linalg.norm(x_seed) * jit_.astype(
                base.dtype) / np.sqrt(base.size)
        return base.astype(a.dtype)
    return init


def main():
    cfg = t2.ArrayConfig(nt=NT, nr=NT)
    out = []
    for i, snr in enumerate(SNRS):
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        ks = jax.random.split(key, 4)
        ch = generate_channel(ks[0], cfg, t2.ChannelConfig(n_paths=PATHS,
                                                           rician_k=0),
                              batch=TRIALS)
        rep = sparse_formulation(cfg, ch, SEARCH)
        sensing = generate_sensing_matrix(
            ks[1], "Random_Phase_State", M, 1, cfg, rep.ad,
            aod_range=(-SEARCH / 2, SEARCH / 2),
            aoa_range=(-SEARCH / 2, SEARCH / 2), batch=TRIALS)
        meas = generate_measurement(ks[2], sensing.fw, ch.vec_h, snr, True,
                                    w=None, mt=M)
        b = jnp.sqrt(meas.norm_square)
        acfg = AdmmConfig()
        flags = MethodFlags(plomp=True, plgamp=False, admm_lowrank_v4=False)

        # PLOMP per instance -> vec_h seeds
        seeds_plomp, nmse_plomp = [], []
        for u in range(TRIALS):
            res = recover_sparse(jax.random.fold_in(ks[3], u),
                                 meas.norm_square[u],
                                 sensing.measurement_mat[u], flags, s=PATHS,
                                 noise_power=float(meas.noise_power))
            vec = rep.ad @ res["plomp"]
            seeds_plomp.append(np.asarray(vec))
            nmse_plomp.append(float(nmse_h_projection(
                vec[None], ch.vec_h[u:u + 1])[0]))

        row = {"snr_db": snr,
               "plomp_db": round(10 * np.log10(np.mean(nmse_plomp)), 2)}

        for name, seeds in [("spectral", None),
                            ("truth", np.asarray(ch.vec_h)),
                            ("plomp_init", np.stack(seeds_plomp))]:
            per = []
            for u in range(TRIALS):
                if seeds is None:
                    admm_mod.spectral_initialize = orig_spectral
                else:
                    admm_mod.spectral_initialize = make_init_override(
                        jnp.asarray(seeds[u]))
                jax.clear_caches()
                res = admm_mod.solve_lowrank_multi(
                    jax.random.fold_in(ks[3], 100 + u), sensing.fw[u], b[u],
                    cfg.nt, cfg.nr, acfg)
                per.append(float(nmse_h_projection(
                    res.x[None], ch.vec_h[u:u + 1])[0]))
            row[f"a2_{name}_db"] = round(10 * np.log10(np.mean(per)), 2)
        admm_mod.spectral_initialize = orig_spectral
        out.append(row)
        print(json.dumps(row), flush=True)
    with open("/tmp/diag_lowsnr_init.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
