#!/bin/sh
# Regenerate the golden snapshots in tests/golden/ after an INTENTIONAL
# semantic change (CPU, deterministic).  Review the diff before committing.
set -e
cd "$(dirname "$0")/.."
DATA=/root/reference/test/data
run() {
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python -m isocon_tpu.cli "$@"
}
rm -rf /tmp/golden200 /tmp/golden500 /tmp/golden1000
run pipeline -fl_reads "$DATA/simulated_pacbio_reads_n_200.fa" \
    -outfolder /tmp/golden200 --batch_pairs 64
cp /tmp/golden200/final_candidates.fa tests/golden/n200_final_candidates.fa
cp /tmp/golden200/candidates_converged.fa tests/golden/n200_candidates_converged.fa
run pipeline -fl_reads "$DATA/simulated_pacbio_reads_n_500.fa" \
    -outfolder /tmp/golden500 --batch_pairs 64
cp /tmp/golden500/final_candidates.fa tests/golden/n500_final_candidates.fa
cp /tmp/golden500/candidates_converged.fa tests/golden/n500_candidates_converged.fa
run get_candidates -fl_reads "$DATA/simulated_pacbio_reads_n_1000.fa" \
    -outfolder /tmp/golden1000 --batch_pairs 64
cp /tmp/golden1000/candidates_converged.fa tests/golden/n1000_candidates_converged.fa
rm -rf /tmp/golden2000
run pipeline -fl_reads "$DATA/simulated_pacbio_reads_n_2000.fa" \
    -outfolder /tmp/golden2000 --batch_pairs 64
cp /tmp/golden2000/final_candidates.fa tests/golden/n2000_final_candidates.fa
echo "golden snapshots regenerated; git diff tests/golden/ to review"
