"""CLI argument/override surface tests (no device work)."""

import sys

sys.path.insert(0, '.')

import eval as eval_cli
import infer as infer_cli
import train as train_cli


def test_train_overrides():
    args = train_cli.parse_args([
        '--config', 'x.yaml', '--epochs', '7', '--batch-size', '4',
        '--learning-rate', '0.01', '--weights', 'w.msgpack', '--resume',
        '--input-shape', '320', '320'])
    cfg = train_cli.apply_overrides({}, args)
    assert cfg['training']['epochs'] == 7
    assert cfg['training']['batch_size'] == 4
    assert cfg['training']['learning_rate'] == 0.01
    assert cfg['resume']['enabled'] and cfg['resume'][
        'weights_path'] == 'w.msgpack'
    assert cfg['model']['preset']['input_shape'] == [320, 320, 3]


def test_infer_overrides_and_type_detect(tmp_path):
    d = tmp_path / 'imgs'
    d.mkdir()
    args = infer_cli.parse_args([
        '--input', str(d), '--conf', '0.3', '--nms', '0.5',
        '--nms-method', 'soft', '--output', 'out'])
    cfg = infer_cli.apply_overrides({}, args)
    assert cfg['input']['type'] == 'directory'
    assert cfg['detection']['confidence_threshold'] == 0.3
    assert cfg['detection']['nms_threshold'] == 0.5
    assert cfg['detection']['nms_method'] == 'soft'
    assert cfg['output']['output_dir'] == 'out'

    args = infer_cli.parse_args(['--input', 'movie.mp4'])
    assert infer_cli.apply_overrides({}, args)['input']['type'] == 'video'
    args = infer_cli.parse_args(['--input', '0'])
    assert infer_cli.apply_overrides({}, args)['input']['type'] == 'camera'
    args = infer_cli.parse_args(['--input', 'x.jpg'])
    assert infer_cli.apply_overrides({}, args)['input']['type'] == 'image'

    # reference flag parity: --no-save / --no-show (infer.py:82-91)
    args = infer_cli.parse_args(['--no-save', '--no-show'])
    cfg = infer_cli.apply_overrides({'output': {'save_result': True,
                                                'show_result': True}}, args)
    assert cfg['output']['save_result'] is False
    assert cfg['output']['show_result'] is False


def test_eval_overrides():
    args = eval_cli.parse_args([
        '--data', 'ann.txt', '--batch-size', '2', '--conf', '0.2',
        '--max-images', '50', '--weights', 'w.msgpack'])
    cfg = eval_cli.apply_overrides({}, args)
    assert cfg['data']['annotation'] == 'ann.txt'
    assert cfg['evaluation']['batch_size'] == 2
    assert cfg['evaluation']['confidence_threshold'] == 0.2
    assert cfg['evaluation']['max_images'] == 50
    assert cfg['weights_path'] == 'w.msgpack'


def test_all_config_examples_load():
    """Every shipped .example/.recommended config parses, merges its model
    preset, and validates (the reference ships the same variant surface:
    eval fast/full/test/test_viz, train recommended/test)."""
    import glob
    import os
    from multigriddet_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, 'configs', '*.example'))
                   + glob.glob(os.path.join(repo, 'configs',
                                            '*.recommended')))
    assert len(paths) >= 8
    for p in paths:
        name = os.path.basename(p)
        kind = ('train' if name.startswith('train')
                else 'eval' if name.startswith('eval') else 'infer')
        cfg = load_config(p, config_type=kind)
        assert cfg['model']['preset']['architecture']


def test_get_model_info_schema():
    """get_model_info mirrors the reference's return schema
    (reference config/model_builder.py:302-330) for both model types."""
    from multigriddet_tpu.config import get_model_info
    info = get_model_info({'model': {
        'name': 'm', 'type': 'preset',
        'preset': {'architecture': 'multigriddet_darknet',
                   'num_classes': 4, 'input_shape': [416, 416, 3]}}})
    assert info == {'name': 'm', 'type': 'preset',
                    'architecture': 'multigriddet_darknet',
                    'num_classes': 4, 'input_shape': (416, 416, 3),
                    'num_anchors_per_head': [3, 3, 3]}
    info = get_model_info({'model': {'type': 'custom', 'custom': {
        'backbone': {'type': 'darknet53'}, 'neck': {'type': 'multigrid_fpn'},
        'head': {'type': 'multigrid', 'num_classes': 7}}}})
    assert info['architecture'] == 'custom_darknet53_multigrid_fpn_multigrid'
    assert info['num_classes'] == 7
    assert info['input_shape'] == (608, 608, 3)
