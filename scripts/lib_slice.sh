# Shared ScaleUp-slice regeneration guard (sourced, not executed).
#
# ensure_slice <srcDir> <sliceDir> <factor>
#
# Regenerates the slice unless a COMPLETE one for exactly (src, factor)
# exists. The marker is written only after ScaleUp finishes, so a crashed
# partial generation can never be silently reused. Honors SPARK_DRIVER_MEM
# (default 64g for big factors) and SPARK_GRAFT_CPUS (default 32).
#
# Single source of truth for the marker protocol: scale_sweep.sh and
# sf100_bench.sh both source this file, so a change to WANT (e.g. adding a
# generator version) cannot apply to one caller and not the other.
ensure_slice() {
  local src="${1:?srcDir}" slice="${2:?sliceDir}" factor="${3:?factor}"
  local marker="$slice/.scaleup-complete"
  local want="src=$src factor=$factor"
  if [ ! -f "$marker" ] || [ "$(cat "$marker")" != "$want" ]; then
    rm -rf "$slice"
    SPARK_DRIVER_MEM="${SPARK_DRIVER_MEM:-64g}" \
    SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
      sbt -batch "runMain graft.tools.ScaleUp $src $slice $factor"
    echo "$want" > "$marker"
  fi
}
