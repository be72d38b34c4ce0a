#!/bin/sh
# Accuracy gate for the bf16 training default (VERDICT r2 weak #3):
# schema_net.ir_atlas.graph_precision 'default' (bf16 graph contractions,
# the training default set in train/workers.py) vs 'highest' (fp32, what
# every parity test pins). Same seed, same artifacts, CIFAR-100-scale
# synthetic (K=100, M=1024 — the PERFORMANCE.md dress-rehearsal recipe);
# PASS = final top-1 within 0.5 pts.
#
# usage: tools/ab_graph_precision.sh  (on the TPU host; ~25 min)
# All knobs overridable via env (AB_K/AB_M/AB_MAXF/AB_EPOCHS/AB_RUN/AB_BS)
# so the mechanics can be smoke-tested off-chip at toy scale.
set -e
cd "$(dirname "$0")/.."
RUN=${AB_RUN:-run/ab_gp}
SEED=0
K=${AB_K:-100}
M=${AB_M:-1024}
MAXF=${AB_MAXF:-400000}
EPOCHS=${AB_EPOCHS:-3}
BS=${AB_BS:-256}

echo "== stage 0: backbone fine-tune (2 epochs, scratch) =="
python -m schemanet_tpu.cli train --worker backbone_worker \
  --cfg configs/synthetic/vanilla/deit_tiny.yaml --log-dir $RUN/vanilla \
  --seed $SEED -o dataset.num_classes=$K -o training.train_epochs=$EPOCHS \
  -o training.val_interval=100000 -o training.batch_size=$BS

echo "== stage 1: codebook extraction =="
python -m schemanet_tpu.cli extract \
  --cfg configs/synthetic/ingredient/deit_tiny-l9-M_128.yaml \
  --ckpt $RUN/vanilla/ckpt/best --save-path $RUN/ingredient \
  --max-features $MAXF --batch-size $BS --dtype bfloat16 \
  --seed $SEED -o dataset.num_classes=$K -o discretization.vocabulary.size=$M

echo "== stage 2: bundle export =="
python -m schemanet_tpu.cli export \
  --cfg configs/synthetic/ingredient/deit_tiny-l9-M_128.yaml \
  --ckpt $RUN/vanilla/ckpt/best \
  --vocabulary-fp $RUN/ingredient/cluster_${M}_from_${MAXF}.npy \
  --save-path $RUN/ingredient/bundle --num-classes $K \
  --seed $SEED -o dataset.num_classes=$K -o discretization.vocabulary.size=$M

echo "== stage 3: IR-Atlas init =="
python -m schemanet_tpu.cli init \
  --cfg configs/synthetic/schema_net/deit_tiny-l9-M_128.yaml \
  --save-fp $RUN/init_IR_atlas.msgpack --batch-size $BS \
  --seed $SEED -o dataset.num_classes=$K -o schema_net.bundle=$RUN/ingredient/bundle

# AB_ONLY_DEFAULT=1: stop after the `default` arm — enough to (re)build the
# stage 0-3 artifacts + the fp32-moments baseline that ab_atlas_moments.sh
# compares against, without burning chip time on the `highest` arm again.
ARMS="default highest"
[ -n "$AB_ONLY_DEFAULT" ] && ARMS="default"
for P in $ARMS; do
  echo "== stage 4: SchemaNet training (graph_precision=$P, 3 epochs) =="
  python -m schemanet_tpu.cli train --worker schema_net_worker \
    --cfg configs/synthetic/schema_net/deit_tiny-l9-M_128.yaml \
    --log-dir $RUN/schema_$P --seed $SEED \
    -o dataset.num_classes=$K \
    -o schema_net.bundle=$RUN/ingredient/bundle \
    -o schema_net.initial_state_fp=$RUN/init_IR_atlas.msgpack \
    -o schema_net.ir_atlas.graph_precision=$P \
    -o training.train_epochs=$EPOCHS 2>&1 | tee $RUN/schema_$P.stdout
done

echo "== A/B result =="
for P in default highest; do
  printf '%s: ' $P
  grep -o "final eval: .*" $RUN/schema_$P.stdout | tail -1
done
