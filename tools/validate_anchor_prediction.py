#!/usr/bin/env python3
"""Trainable-anchor-prediction validation (the MultiGridDet core novelty).

Trains the 45M flagship with 3 anchors per scale (aspect 0.5/1.0/2.0) on
synthetic objects spanning 3 size bands x 3 aspect ratios, so detection
quality depends on the anchor-classification head picking the right
anchor per object.

Last verified on TPU v5e: 120 epochs, anchor loss 24.3 -> 1.27,
mAP50 = 0.993, mAP@0.5:0.95 = 0.804.

Usage:  python tools/validate_anchor_prediction.py
"""

import sys
sys.path.insert(0, __file__.rsplit('/', 2)[0])

import os, time, numpy as np, jax, jax.numpy as jnp, optax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
from PIL import Image, ImageDraw
from multigriddet_tpu.models import create_model
from multigriddet_tpu.losses import LossConfig
from multigriddet_tpu.data import MultiGridDataGenerator, load_annotation_lines
from multigriddet_tpu.data.annotations import parse_annotation_line, letterbox_image
from multigriddet_tpu.training import create_train_state, make_train_step, make_infer_step
from multigriddet_tpu.evaluation import calculate_map

root='/tmp/mgd_anchor_validation'; os.makedirs(root, exist_ok=True)
rng=np.random.RandomState(1); lines=[]
# objects at 3 distinct aspect ratios per size band -> anchor classification matters
for i in range(200):
    img = Image.new('RGB',(256,256), tuple(rng.randint(0,50,3)))
    d = ImageDraw.Draw(img)
    toks=[]
    for _ in range(rng.randint(1,3)):
        cls = rng.randint(0,2)
        band = rng.randint(0,3)       # size band -> layer
        base = [96, 56, 28][band]
        ar = rng.choice([0.5, 1.0, 2.0])   # aspect -> anchor within layer
        w = int(base*np.sqrt(ar)); h = int(base/np.sqrt(ar))
        w, h = max(w,12), max(h,12)
        if w >= 250 or h >= 250: continue
        x1,y1 = rng.randint(0,256-w), rng.randint(0,256-h)
        col = (230,40,40) if cls==0 else (40,230,40)
        if cls==0: d.rectangle([x1,y1,x1+w,y1+h], fill=col)
        else: d.ellipse([x1,y1,x1+w,y1+h], fill=col)
        toks.append(f'{x1},{y1},{x1+w},{y1+h},{cls}')
    if not toks: continue
    p=f'{root}/i{i}.jpg'; img.save(p, quality=95)
    lines.append(p+' '+' '.join(toks))
open(f'{root}/ann.txt','w').write('\n'.join(lines)+'\n')

# 3 anchors per scale: aspect 0.5 / 1.0 / 2.0 at each band size
def anchor_set(base):
    return np.array([[base*0.71, base*1.41],[base, base],[base*1.41, base*0.71]], np.float32)
ANCHORS=[anchor_set(96), anchor_set(56), anchor_set(28)]
HW, C, B = (256,256), 2, 16
gen = MultiGridDataGenerator(load_annotation_lines(f'{root}/ann.txt'), ANCHORS, C, HW,
    batch_size=B, max_boxes=4, augment={'enabled': True, 'mosaic_prob': 0.0, 'mixup_prob': 0.0,
        'hflip_prob': 0.5, 'scale_range': (0.9, 1.1), 'rotate_prob': 0.0, 'grayscale_prob': 0.0},
    train=True, seed=0, cache_images=True)
model = create_model('multigriddet_darknet', num_anchors=(3,3,3), num_classes=C,
                     dtype=jnp.bfloat16, bn_momentum=0.9)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1,*HW,3)), train=False))()
EPOCHS=120; spe=len(gen)
sched = optax.warmup_cosine_decay_schedule(1e-5, 1e-3, 3*spe, EPOCHS*spe, 1e-6)
tx = optax.adam(sched)
state = create_train_state(v['params'], v['batch_stats'], tx)
step = make_train_step(model, tx, ANCHORS, C, HW,
    LossConfig(loss_option=2, coord_scale=5.0, no_object_scale=0.5, anchor_scale=1.0), donate=False)
t0=time.time()
for epoch in range(EPOCHS):
    for images, y_true, _ in gen:
        state, m = step(state, images, y_true)
    if epoch % 30 == 0:
        print(f'epoch {epoch} loss {float(m["loss"]):.3f} anchor={float(m["anchor"]):.4f} ({time.time()-t0:.0f}s)', flush=True)
print('final loss', float(m['loss']), 'anchor loss', float(m['anchor']))

infer = make_infer_step(model, ANCHORS, HW, confidence=0.25, max_boxes=8, pre_nms_top_k=128)
trained = {'params': state.params, 'batch_stats': state.batch_stats}
lines = load_annotation_lines(f'{root}/ann.txt', shuffle=False)
preds, gts = {}, {}
for start in range(0, len(lines), 16):
    chunk = lines[start:start+16]
    arrs, metas = [], []
    for line in chunk:
        path, b = parse_annotation_line(line)
        arr,_,_,_ = letterbox_image(Image.open(path).convert('RGB'), HW)
        arrs.append(arr); metas.append(b)
    pad = 16 - len(arrs)
    if pad: arrs += [arrs[-1]]*pad
    bx, cl, sc, valid = infer(trained, jnp.asarray(np.stack(arrs)))
    bx, cl, sc, valid = map(np.asarray, (bx, cl, sc, valid))
    for j, b in enumerate(metas):
        k = valid[j]
        preds[start+j] = {'boxes': bx[j][k], 'classes': cl[j][k].astype(np.int32), 'scores': sc[j][k]}
        gts[start+j] = {'boxes': np.stack([b[:,0],b[:,1],b[:,2]-b[:,0],b[:,3]-b[:,1]],-1),
                        'classes': b[:,4].astype(np.int32)}
r = calculate_map(preds, gts, C)
print('3-ANCHOR (trainable anchor prediction) mAP50:', r['mAP50'], 'mAP:', r['mAP'])
