#!/usr/bin/env bash
# Provision a Cloud TPU VM (single host or pod slice) and install pdc_tpu.
#
# The reference ships an nvidia-docker image (docker/docker_build.py +
# pytorch-dense-correspondence.dockerfile: CUDA 10, PyTorch 1.1, py2.7,
# OpenGL-in-docker plumbing). A TPU deployment needs none of that — jax[tpu]
# brings libtpu; the only native dependency is libpng for the C++ decode
# pool, with a pure-PIL fallback.
#
# Usage:
#   ./deploy/setup_tpu_vm.sh <tpu-name> <zone> [accelerator-type] [repo-url]
# Example:
#   ./deploy/setup_tpu_vm.sh pdc-v5e us-west4-a v5litepod-8 https://github.com/you/pdc-tpu
set -euo pipefail

TPU_NAME="${1:?tpu name}"
ZONE="${2:?gcp zone}"
ACCEL="${3:-v5litepod-8}"
REPO_URL="${4:-}"

if ! gcloud compute tpus tpu-vm describe "$TPU_NAME" --zone "$ZONE" >/dev/null 2>&1; then
  echo ">> creating TPU VM $TPU_NAME ($ACCEL) in $ZONE"
  gcloud compute tpus tpu-vm create "$TPU_NAME" \
    --zone "$ZONE" \
    --accelerator-type "$ACCEL" \
    --version tpu-ubuntu2204-base
fi

# --worker=all runs the same provisioning on every host of a pod slice
SSH=(gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all --command)

echo ">> installing python deps on all workers"
"${SSH[@]}" '
  set -e
  sudo apt-get update -qq && sudo apt-get install -y -qq libpng-dev git
  pip install -q --upgrade "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  pip install -q flax optax numpy pyyaml pillow pandas matplotlib scipy
'

# Gated ImageNet-weights download (the reference backbone is always
# ImageNet-pretrained, dense_correspondence_network.py:373-383; pdc_tpu makes
# this an explicit opt-in because the checkpoint is a 87 MB external fetch).
# Enable with PDC_PRETRAINED=1; training configs then set
# dense_correspondence_network.backbone.pretrained: true.
if [[ "${PDC_PRETRAINED:-0}" == "1" ]]; then
  echo ">> fetching torchvision ImageNet checkpoints on all workers"
  "${SSH[@]}" '
    set -e
    mkdir -p ~/.cache/pdc_tpu/pretrained
    for m in resnet34-b627a593:resnet34 resnet50-0676ba61:resnet50; do
      file="${m%%:*}"; name="${m##*:}"
      [[ -f ~/.cache/pdc_tpu/pretrained/$name.pth ]] && continue
      curl -fL -o ~/.cache/pdc_tpu/pretrained/$name.pth \
        https://download.pytorch.org/models/$file.pth
    done
  '
fi

if [[ -n "$REPO_URL" ]]; then
  echo ">> cloning + building pdc_tpu on all workers"
  "${SSH[@]}" "
    set -e
    rm -rf ~/pdc-tpu && git clone '$REPO_URL' ~/pdc-tpu
    cd ~/pdc-tpu && make -C native || echo 'native loader skipped (PIL fallback active)'
    cd ~/pdc-tpu && JAX_PLATFORMS=cpu python -m pytest tests/ -q -x
  "
fi

echo ">> done. sanity-check the chips with:"
echo "   gcloud compute tpus tpu-vm ssh $TPU_NAME --zone $ZONE --command 'cd ~/pdc-tpu && python bench.py'"
