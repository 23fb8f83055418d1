#!/usr/bin/env bash
# Run every example case and tee its stdout into results/<script>.log —
# the reference's runAll.sh pattern (numerical_examples/**/runAll.sh).
#
# Scripts run SERIALLY: the remote-TPU tunnel supports one job at a time.
# Force the CPU backend for a quick sweep with:
#   HELMHOLTZ_X_FORCE_CPU=1 ./run_all.sh
set -u
cd "$(dirname "$0")"

SCRIPTS=(
  rijke_tube_1d/passive.py
  rijke_tube_1d/active.py
  rijke_tube_1d/active_adj.py
  rijke_tube_2d/passive.py
  rijke_tube_2d/active.py
  rijke_tube_3d/passive.py
  rijke_tube_3d/active.py
  prf_rijke_tube/active.py
  prf_rijke_tube/2d/active.py
  prf_rijke_tube/3d/active.py
  manufactured_solution/manufactured.py
  flamed_duct/passive.py
  flamed_duct/active.py
  micca/active_fpi.py
  micca/active_newton.py
  micca/active_modes.py
  micca/bloch_passive.py
  micca/bloch_active.py
  rijke_ffd/main_shape.py
  rijke_ffd/generate_optimized_mesh.py
  rijke_ffd/main_opt.py
)

# Optional Lm step: regenerate the structured case meshes natively
# (gmsh-free; see tools/generate_case_mesh.py) before running the cases.
if [ "${REGENERATE_MESHES:-0}" = "1" ]; then
  (cd .. && python tools/generate_case_mesh.py rijke3d examples/rijke_tube_3d/MeshDir/mesh)
fi

failed=()
for s in "${SCRIPTS[@]}"; do
  d=$(dirname "$s")
  b=$(basename "$s" .py)
  mkdir -p "$d/results"
  echo "==> $s (log: $d/results/$b.log)"
  if ! (cd "$d" && python "$b.py" -nopopup 2>&1 | tee "results/$b.log"); then
    failed+=("$s")
  fi
done

if [ ${#failed[@]} -gt 0 ]; then
  echo "FAILED: ${failed[*]}"
  exit 1
fi
echo "All examples completed."
