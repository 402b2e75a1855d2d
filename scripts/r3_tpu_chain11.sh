#!/bin/bash
# Round-3 TPU queue, part 11 (after chain10's guard-mode rerun):
#   16. Oscillator L=55 with the forward-Laplacian exact path
#       (laplacian_eps -1): the round-2 winning recipe (sequential,
#       shift +24, 200k) ran FD eps=0.01 and landed max rel-err 7.7e-3;
#       the exact Laplacian removes the O(eps^2) stencil bias and the
#       forward engine makes it affordable.  Also the CLI-path e2e
#       exercise of the engine on real TPU.
set -u
cd "$(dirname "$0")/.."

while ! grep -q "chain10. guard-mode L=36 800k done" log/r3/chain.log 2>/dev/null; do
  sleep 120
done
sleep 30
echo "[chain11] starting oscillator L=55 exact-forward 200k at $(date)" >> log/r3/chain.log
for attempt in 1 2 3; do
  python -m neuralsvd_tpu.cli.pde \
    --optimizer rmsprop --use_lr_scheduler true --ema_decay 0.995 \
    --batch_size 512 --lr 1e-4 --num_iters 200000 --laplacian_eps -1 \
    --eval_freq 200000 --overwrite true \
    --potential_type harmonic_oscillator --ndim 2 --lim 5 --val_eps 0.1 \
    --neigs 55 --apply_boundary false --apply_exp_mask true \
    --exp_mask_init_scale 10 --mlp_hidden_dims 128,128,128 \
    --parallel true --nonlinearity softplus \
    --sampling_mode gaussian --sampling_scale 4 \
    --operator_scale 1 --operator_shift 24.0 \
    --use_fourier_feature true --fourier_mapping_size 256 --fourier_scale 1 \
    --neuralsvd.step 1 --neuralsvd.sequential true \
    --loss neuralsvd --seed 0 --log_dir log/r3/osc55fwd \
    > log/r3/osc55fwd_200k.log 2>&1 && break
  echo "[chain11] attempt $attempt failed at $(date); retrying in 120s" >> log/r3/chain.log
  sleep 120
done
echo "[chain11] oscillator L=55 exact-forward done at $(date)" >> log/r3/chain.log
