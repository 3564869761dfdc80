#!/usr/bin/env bash
# Launch (multi-host) training on a provisioned TPU VM / pod slice.
#
# Single host: runs the training example directly.
# Pod slice: launches the same command on every worker; jax.distributed
# initialization is automatic on Cloud TPU (pdc_tpu.parallel.distributed
# .ensure_initialized discovers the coordinator from the TPU metadata), and
# the sharded device cache gives each chip 1/n of the dataset.
#
# Usage:
#   ./deploy/run_training.sh <tpu-name> <zone> [training args...]
#
# With a real pdc dataset on the VM, train through the unified CLI instead:
#   ./deploy/run_training.sh my-tpu us-central2-b  # tutorial (synthetic)
#   gcloud ... --command 'cd ~/pdc-tpu && python -m pdc_tpu train \
#       --dataset_config config/composite/generated_dataset.yaml \
#       --data_dir ~/pdc --name my_net'
set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?gcp zone}"
shift 2

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command "
  cd ~/pdc-tpu &&
  nohup python examples/training_tutorial.py $* > train_\$(hostname).log 2>&1 &
  echo launched on \$(hostname)
"
echo ">> tail logs with:"
echo "   gcloud compute tpus tpu-vm ssh $TPU_NAME --zone $ZONE --command 'tail -f ~/pdc-tpu/train_*.log'"
