#!/bin/bash
# Round-3 TPU queue, part 15: H2+ (hydrogen molecular ion) in 3D at the
# equilibrium internuclear distance d = 2R = 2.0 Bohr.  With cfg.charge=1
# the built operator is -H' = -2*(-(1/2)lap - 1/r_A - 1/r_B), so the
# learned eigenvalues are -2x the tabulated Born-Oppenheimer electronic
# energies (Bates-Reid tables) plus the +1 shift:
#   1sσg -1.1026342 -> 3.2052684      2pσu -0.6675343 -> 2.3350686
#   2pπu -0.4287720 -> 1.8575439 (x2) 2sσg -0.3608648 -> 1.7217297
# The reference ships this potential_type with NO measured result.
# Waits for chain14.
set -u
cd "$(dirname "$0")/.."

relay_wait() {
  while ! timeout 3 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8103' 2>/dev/null; do
    sleep 60
  done
}

while kill -0 "$(cat /tmp/chain14.pid 2>/dev/null)" 2>/dev/null \
      && ! grep -q "chain14. ALL DONE" log/r3/chain.log; do
  sleep 120
done
echo "[chain15] starting H2+ 3D 300k at $(date)" >> log/r3/chain.log
for a in 1 2 3; do
  relay_wait
  python -m neuralsvd_tpu.cli.pde \
    --problem sch --potential_type hydrogen_mol_ion --hydrogen_mol_ion_R 1.0 \
    --ndim 3 --neigs 5 --operator_shift 1.0 --laplacian_eps -1 \
    --mlp_hidden_dims 128,128,128 --nonlinearity softplus --parallel true \
    --apply_boundary false --apply_exp_mask true --exp_mask_init_scale 3 \
    --use_fourier_feature true --fourier_mapping_size 128 \
    --fourier_scale 0.3 --fourier_append_radial true \
    --sampling_mode gaussian_mixture --sampling_scales 0.5,1.5,4 \
    --batch_size 512 --val_mc_size 16384 \
    --optimizer adam --lr 1e-3 --use_lr_scheduler true --grad_clip 100 \
    --num_iters 300000 --print_freq 10000 --eval_freq 50000 \
    --loss neuralsvd --neuralsvd.step 1 --neuralsvd.sequential true \
    --seed 0 --log_dir log/r3/h2p --overwrite true \
    > log/r3/h2p_300k.log 2>&1 && break
  echo "[chain15] H2+ attempt $a failed at $(date)" >> log/r3/chain.log
  sleep 120
done
echo "[chain15] ALL DONE at $(date)" >> log/r3/chain.log
