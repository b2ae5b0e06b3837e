"""Tests for ginlite + the Config surface: every shipped config must parse."""

import glob
import os

import jax.numpy as jnp
import pytest

from multinerf_tpu import configs
from multinerf_tpu import ginlite

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', 'configs')


@pytest.fixture(autouse=True)
def _clean_gin():
  ginlite.clear_config()
  yield
  ginlite.clear_config()


def test_default_config():
  c = ginlite.make('Config')
  assert c.batch_size == 16384
  assert c.max_steps == 250000
  assert c.data_loss_type == 'charb'


@pytest.mark.parametrize(
    'path', sorted(glob.glob(os.path.join(CONFIG_DIR, '*.gin'))),
    ids=os.path.basename)
def test_every_shipped_config_parses(path):
  ginlite.parse_config_files_and_bindings([path], [])
  c = ginlite.make('Config')
  assert c.batch_size > 0
  # No Config binding may fall through as unknown.
  assert not [u for u in ginlite.unknown_bindings()
              if u.startswith('Config.')], ginlite.unknown_bindings()


def test_360_bindings_resolve_references():
  ginlite.parse_config_files_and_bindings(
      [os.path.join(CONFIG_DIR, '360.gin')], [])
  c = ginlite.make('Config')
  assert c.dataset_loader == 'llff'
  assert c.far == 1e6
  model_b = ginlite.get_bindings('Model')
  assert model_b['raydist_fn'] is jnp.reciprocal
  assert model_b['opaque_background'] is True
  nerf_b = ginlite.get_bindings('NerfMLP')
  from multinerf_tpu.ops import coord
  assert nerf_b['warp_fn'] is coord.contract
  assert nerf_b['net_width'] == 1024


def test_llff_raw_references_safe_exp():
  ginlite.parse_config_files_and_bindings(
      [os.path.join(CONFIG_DIR, 'llff_raw.gin')], [])
  from multinerf_tpu.ops import mathx
  assert ginlite.get_bindings('NerfMLP')['rgb_activation'] is mathx.safe_exp
  c = ginlite.make('Config')
  assert c.rawnerf_mode and c.data_loss_type == 'rawnerf'
  assert c.max_steps == 500000


def test_include_resolves_basename_fallback():
  ginlite.parse_config_files_and_bindings(
      [os.path.join(CONFIG_DIR, 'llff_raw_test.gin')], [])
  c = ginlite.make('Config')
  # From the included llff_raw.gin:
  assert c.rawnerf_mode
  # Overridden by llff_raw_test.gin itself:
  assert c.factor == 0 and c.eval_raw_affine_cc


def test_command_line_bindings_override_files():
  ginlite.parse_config_files_and_bindings(
      [os.path.join(CONFIG_DIR, '360.gin')],
      ["Config.batch_size = 1024", "Config.data_dir = '/tmp/xyz'",
       "Model.num_levels = 2"])
  c = ginlite.make('Config')
  assert c.batch_size == 1024
  assert c.data_dir == '/tmp/xyz'
  assert ginlite.get_bindings('Model')['num_levels'] == 2


def test_tuples_dicts_and_none_parse():
  ginlite.parse_config_files_and_bindings(
      [], ["Config.render_resolution = (640, 360)",
           "Config.weight_decay_mults = {'NerfMLP_0': 1e-5}",
           "Config.checkpoint_dir = None",
           "Model.bg_intensity_range = (0., 1.)"])
  c = ginlite.make('Config')
  assert c.render_resolution == (640, 360)
  assert c.weight_decay_mults == {'NerfMLP_0': 1e-5}
  assert c.checkpoint_dir is None


def test_unknown_params_are_skipped_not_fatal():
  ginlite.parse_config_files_and_bindings(
      [], ["Config.not_a_real_field = 3"])
  c = ginlite.make('Config')  # Must not raise.
  assert any('not_a_real_field' in u for u in ginlite.unknown_bindings())


def test_config_str_roundtrip():
  ginlite.parse_config_files_and_bindings(
      [os.path.join(CONFIG_DIR, '360.gin')], [])
  rendered = ginlite.config_str()
  assert "Config.dataset_loader = 'llff'" in rendered
  assert 'NerfMLP.warp_fn = @coord.contract' in rendered
  # The rendered form must itself be parseable.
  ginlite.clear_config()
  for line in rendered.splitlines():
    if line.strip():
      ginlite.parse_binding_line(line)
  c = ginlite.make('Config')
  assert c.far == 1e6


def test_multiline_and_comment_bindings(tmp_path):
  cfg = tmp_path / 'multi.gin'
  cfg.write_text(
      "# leading comment\n"
      "Config.weight_decay_mults = {\n"
      "    'NerfMLP_0': 1e-5,   # inline comment\n"
      "    'PropMLP_0': 2e-4,\n"
      "}\n"
      "Config.render_resolution = (\n"
      "    640,\n"
      "    360,\n"
      ")\n"
      "Config.lr_init = 1e-3  # trailing comment\n")
  ginlite.parse_config_files_and_bindings([str(cfg)], [])
  c = ginlite.make('Config')
  assert c.weight_decay_mults == {'NerfMLP_0': 1e-5, 'PropMLP_0': 2e-4}
  assert c.render_resolution == (640, 360)
  assert c.lr_init == 1e-3


def test_negative_and_scientific_literals():
  ginlite.parse_config_files_and_bindings(
      [], ['NerfMLP.rgb_bias = -5.', 'Config.lr_final = 2e-05',
           'Config.far = 1e6', 'Model.anneal_slope = 0.'])
  assert ginlite.get_bindings('NerfMLP')['rgb_bias'] == -5.0
  c = ginlite.make('Config')
  assert c.lr_final == 2e-5 and c.far == 1e6


def test_binding_overrides_are_last_wins():
  ginlite.parse_config_files_and_bindings(
      [], ['Config.batch_size = 111', 'Config.batch_size = 222'])
  assert ginlite.make('Config').batch_size == 222


def test_reference_with_arithmetic_expression():
  """Expressions mixing literals parse via the restricted eval."""
  ginlite.parse_config_files_and_bindings(
      [], ['Config.batch_size = 4 * 1024'])
  assert ginlite.make('Config').batch_size == 4096
