"""Worker process for the 2-process multi-host tests (not a pytest module).

Launched twice by ``test_multihost_2proc.py`` with a shared coordinator
address; each process owns 4 virtual CPU devices of an 8-device global mesh
and runs the selected tiny recipe end-to-end (teacher / teacher_images /
ssl / kd — see ``mh_recipe.py``): per-host batch slices (or per-host image
partitions), globally-sharded steps, all-gathered eval, main-only
checkpointing on the SHARED workdir. Results land in a per-process JSON for
the parent to compare (across processes AND against the single-process run
of the identical recipe).

Usage: python mh_worker.py <process_id> <num_processes> <port> <outdir>
       [recipe]
"""
import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    recipe = sys.argv[5] if len(sys.argv) > 5 else "teacher"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    # -O0 like conftest: faster compiles shrink the skew between the two
    # contending workers on a 1-core host — gloo's context init times out
    # at 30 s when one worker reaches the first collective long before the
    # other (observed under full-suite load)
    if os.environ.get("TEST_XLA_OPT") != "1":
        os.environ["XLA_FLAGS"] += " --xla_backend_optimization_level=0"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from multimodal_edema_prediction_tpu.parallel.multihost import (
        initialize_distributed, is_main_process)
    initialize_distributed(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    from mh_recipe import run_recipe
    result = run_recipe(recipe, workdir=os.path.join(outdir, "shared"))
    result["process_id"] = pid
    result["is_main"] = is_main_process()
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
