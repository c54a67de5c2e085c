"""Convert reference (PyTorch) EVE checkpoints to eve_tpu parameter pytrees.

The reference publishes weights as torch state dicts
(``/root/reference/src/utils/load_model.py:32-55``, files like
``eve_eyenet_GRU.pt``); this module maps their key/layout conventions onto the
flax module trees defined in ``eve_tpu.models``. Needed for numerical-parity
evaluation against the released reference models.

Layout conversions: conv ``(O, I, KH, KW) -> (KH, KW, I, O)``; linear
``(O, I) -> (I, O)``; dense RNN cell weights keep the torch layout (our cells
store ``weight_ih (G*H, in)`` exactly); InstanceNorm affine ``weight/bias ->
scale/bias``.
"""

import numpy as np


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w):
    return np.ascontiguousarray(w.T)


def _set(tree, path, value):
    parts = path.split('/')
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value)


def convert_eye_net(state_dict):
    """torch EyeNet state dict (numpy values) -> flax params tree."""
    out = {}
    for key, v in state_dict.items():
        if key.startswith('cnn_layers.'):
            rest = key[len('cnn_layers.'):]
            if rest == 'conv1.weight':
                _set(out, 'cnn/conv1/kernel', _conv(v))
            elif rest == 'fc.weight':
                _set(out, 'cnn/fc/kernel', _linear(v))
            elif rest == 'fc.bias':
                _set(out, 'cnn/fc/bias', v)
            elif rest.startswith('layer'):
                # layer{L}.{I}.conv1.weight / downsample.0.weight
                parts = rest.split('.')
                lname, idx = parts[0], parts[1]
                block = f'cnn/{lname}_{idx}'
                if parts[2] == 'downsample':
                    _set(out, f'{block}/downsample_conv/kernel', _conv(v))
                else:
                    _set(out, f'{block}/{parts[2]}/kernel', _conv(v))
            else:
                raise KeyError('Unmapped EyeNet key: %s' % key)
        elif key.startswith('fc_common.') or key.startswith('fc_to_gaze.') \
                or key.startswith('fc_to_pupil.') or key.startswith('static_fc.'):
            mod, idx, param = key.split('.')
            name = f'{mod}_{idx}'
            if param == 'weight':
                _set(out, f'{name}/kernel', _linear(v))
            else:
                _set(out, f'{name}/bias', v)
        elif key.startswith('rnn_cells.'):
            _, idx, param = key.split('.')
            _set(out, f'rnn_cell_{idx}/{param}', v)
        else:
            raise KeyError('Unmapped EyeNet key: %s' % key)
    return out


def _convert_preact_block(out, flax_name, torch_prefix, state_dict):
    """Reference RefineNet BasicBlock: layers.{0 IN,2 conv,3 IN,5 conv},
    skip_layer.{0 IN, 2 conv}."""
    mapping = {
        'layers.0': ('in1', 'in'),
        'layers.2': ('conv1', 'conv'),
        'layers.3': ('in2', 'in'),
        'layers.5': ('conv2', 'conv'),
        'skip_layer.0': ('skip_in', 'in'),
        'skip_layer.2': ('skip_conv', 'conv'),
    }
    for tkey, (fname, kind) in mapping.items():
        wkey = f'{torch_prefix}.{tkey}.weight'
        if wkey not in state_dict:
            continue
        w = state_dict[wkey]
        b = state_dict.get(f'{torch_prefix}.{tkey}.bias')
        if kind == 'conv':
            _set(out, f'{flax_name}/{fname}/kernel', _conv(w))
            if b is not None:
                _set(out, f'{flax_name}/{fname}/bias', b)
        else:
            _set(out, f'{flax_name}/{fname}/scale', w)
            _set(out, f'{flax_name}/{fname}/bias', b)


def convert_refine_net(state_dict, num_enc_blocks=(1, 2, 2, 2, 2),
                       rnn_num_cells=None):
    """torch RefineNet state dict (numpy values) -> flax params tree.

    The reference nests five ``WrapEncoderDecoder`` shells
    (refine_net.py:188-212); level k lives under
    ``network.`` + ``between_module.`` * k. ``rnn_num_cells=None``
    auto-detects the cell count from the state-dict keys (a fixed count
    would silently drop cells beyond it).
    """
    out = {}
    # Stem / head
    _set(out, 'initial_0/kernel', _conv(state_dict['initial.0.weight']))
    _set(out, 'initial_0/bias', state_dict['initial.0.bias'])
    _set(out, 'initial_1/scale', state_dict['initial.1.weight'])
    _set(out, 'initial_1/bias', state_dict['initial.1.bias'])
    _set(out, 'initial_3/kernel', _conv(state_dict['initial.3.weight']))
    _set(out, 'initial_3/bias', state_dict['initial.3.bias'])
    _set(out, 'final_0/kernel', _conv(state_dict['final.0.weight']))
    _set(out, 'final_0/bias', state_dict['final.0.bias'])
    _set(out, 'final_2/kernel', _conv(state_dict['final.2.weight']))
    _set(out, 'final_2/bias', state_dict['final.2.bias'])

    for k in range(5):
        prefix = 'network.' + 'between_module.' * k
        for i in range(num_enc_blocks[k]):
            _convert_preact_block(out, f'enc{k}_{i}',
                                  f'{prefix}encoder_blocks.{i}', state_dict)
        _convert_preact_block(out, f'dec{k}_0',
                              f'{prefix}decoder_blocks.0', state_dict)

    bottleneck_prefix = 'network.' + 'between_module.' * 5
    cell_indices = sorted({
        int(key[len(bottleneck_prefix) + len('rnn_cells.'):].split('.')[0])
        for key in state_dict
        if key.startswith(bottleneck_prefix + 'rnn_cells.')})
    if rnn_num_cells is not None:
        assert len(cell_indices) == rnn_num_cells, (
            'checkpoint has %d rnn cells, expected %d'
            % (len(cell_indices), rnn_num_cells))
    for i in cell_indices:
        converted = 0
        for conv_name in ('cell', 'gates', 'gates_1', 'gate_2'):
            wkey = f'{bottleneck_prefix}rnn_cells.{i}.{conv_name}.weight'
            if wkey in state_dict:
                _set(out, f'rnn_cell_{i}/{conv_name}/kernel',
                     _conv(state_dict[wkey]))
                _set(out, f'rnn_cell_{i}/{conv_name}/bias',
                     state_dict[f'{bottleneck_prefix}rnn_cells.{i}.'
                                f'{conv_name}.bias'])
                converted += 1
        assert converted, 'rnn cell %d had no recognized conv weights' % i
    return out


def _conv_inv(v):
    """flax (KH, KW, I, O) -> torch (O, I, KH, KW)."""
    return np.ascontiguousarray(np.transpose(np.asarray(v), (3, 2, 0, 1)))


def eye_net_params_to_torch(params):
    """Inverse of :func:`convert_eye_net`: flax tree -> torch state dict.

    Lets trained eve_tpu weights be exported back into the reference's
    release format (src/utils/load_model.py:35-55 file layout) and pins the
    converter with round-trip tests. Values are numpy arrays in torch layout.
    """
    sd = {}
    if 'stem_conv' in params.get('cnn', {}):
        raise ValueError(
            'This EyeNet uses the TPU-native patchify stem '
            '(tpu_native_arch): it has no reference/torch equivalent and '
            'cannot be exported to the release .pt format.')
    for name, sub in params.items():
        if name == 'cnn':
            for mod, p in sub.items():
                if mod == 'conv1':
                    sd['cnn_layers.conv1.weight'] = _conv_inv(p['kernel'])
                elif mod == 'fc':
                    sd['cnn_layers.fc.weight'] = np.ascontiguousarray(
                        np.asarray(p['kernel']).T)
                    sd['cnn_layers.fc.bias'] = np.asarray(p['bias'])
                elif mod.startswith('layer'):
                    lname, idx = mod.split('_')
                    for cname, cp in p.items():
                        tkey = ('downsample.0' if cname == 'downsample_conv'
                                else cname)
                        sd[f'cnn_layers.{lname}.{idx}.{tkey}.weight'] = \
                            _conv_inv(cp['kernel'])
                else:
                    raise KeyError('Unmapped EyeNet cnn module: %s' % mod)
        elif name.startswith('rnn_cell_'):
            idx = name[len('rnn_cell_'):]
            for pkey, v in sub.items():
                sd[f'rnn_cells.{idx}.{pkey}'] = np.asarray(v)
        else:
            # fc_common_0 / fc_to_gaze_2 / fc_to_pupil_0 / static_fc_0
            mod, idx = name.rsplit('_', 1)
            sd[f'{mod}.{idx}.weight'] = np.ascontiguousarray(
                np.asarray(sub['kernel']).T)
            if 'bias' in sub:  # fc_to_gaze.2 has bias=False (eye_net.py:84)
                sd[f'{mod}.{idx}.bias'] = np.asarray(sub['bias'])
    return sd


_PREACT_INV = {
    'in1': 'layers.0', 'conv1': 'layers.2', 'in2': 'layers.3',
    'conv2': 'layers.5', 'skip_in': 'skip_layer.0', 'skip_conv': 'skip_layer.2',
}


def refine_net_params_to_torch(params):
    """Inverse of :func:`convert_refine_net`: flax tree -> torch state dict."""
    if 'stem' in params:
        raise ValueError(
            'This RefineNet is the TPU-native topology (tpu_native_arch, '
            'models/refine_net_tpu.py): it has no reference/torch '
            'equivalent and cannot be exported to the release .pt format.')
    sd = {}

    def put_mod(prefix, p):
        if 'kernel' in p:
            sd[prefix + '.weight'] = _conv_inv(p['kernel'])
            if 'bias' in p:
                sd[prefix + '.bias'] = np.asarray(p['bias'])
        else:  # instance norm: scale/bias -> weight/bias
            sd[prefix + '.weight'] = np.asarray(p['scale'])
            sd[prefix + '.bias'] = np.asarray(p['bias'])

    for name, sub in params.items():
        if name in ('initial_0', 'initial_1', 'initial_3',
                    'final_0', 'final_2'):
            mod, idx = name.rsplit('_', 1)
            put_mod(f'{mod}.{idx}', sub)
        elif name.startswith('enc') or name.startswith('dec'):
            kind, rest = name[:3], name[3:]
            k, i = rest.split('_')
            prefix = 'network.' + 'between_module.' * int(k)
            tmod = 'encoder_blocks' if kind == 'enc' else 'decoder_blocks'
            for fname, p in sub.items():
                put_mod(f'{prefix}{tmod}.{i}.{_PREACT_INV[fname]}', p)
        elif name.startswith('rnn_cell_'):
            idx = name[len('rnn_cell_'):]
            prefix = 'network.' + 'between_module.' * 5
            for conv_name, p in sub.items():
                put_mod(f'{prefix}rnn_cells.{idx}.{conv_name}', p)
        else:
            raise KeyError('Unmapped RefineNet module: %s' % name)
    return sd


def save_reference_checkpoint(path, params, which):
    """Save an eve_tpu component tree as a reference-format ``.pt`` file."""
    import torch
    sd = (eye_net_params_to_torch(params) if which == 'eye_net'
          else refine_net_params_to_torch(params))
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, path)


def torch_state_dict_to_numpy(state_dict):
    """Detach a torch state dict to plain numpy (requires torch)."""
    return {k: v.detach().cpu().numpy() for k, v in state_dict.items()}


def load_reference_checkpoint(path, which):
    """Load a reference ``.pt`` file and convert it.

    Args:
      path: local path to the torch checkpoint.
      which: 'eye_net' or 'refine_net'.
    """
    import torch  # local import; torch is a conversion-time-only dependency
    sd = torch.load(path, map_location='cpu')
    if hasattr(sd, 'state_dict'):
        sd = sd.state_dict()
    sd = torch_state_dict_to_numpy(sd)
    # Strip an optional top-level module prefix (checkpoint_manager saves
    # sub-dicts keyed as '<prefix>.<param>' — reference checkpoint_manager.py:56-67).
    pfx = which + '.'
    if all(k.startswith(pfx) for k in sd):
        sd = {k[len(pfx):]: v for k, v in sd.items()}
    if which == 'eye_net':
        return convert_eye_net(sd)
    return convert_refine_net(sd)
