"""Every shipped config family must be geometrically valid.

The reference inherits window geometry silently from YAML anchors; an
img_size/window_ratio combination whose window does not divide the patch
grid fails only at trace time deep inside window_partition (this caught a
broken swin_tiny_test: 90x180 grid with a 12x24 window). Validate all of
them statically here.
"""

import yaml

from swin_v2_weather_tpu.config.yparams import YParams, default_config_path
from swin_v2_weather_tpu.models.swin import calc_window_shift


def _config_names():
    with open(default_config_path()) as f:
        return list(yaml.safe_load(f).keys())


class TestConfigGeometry:
    def test_all_configs_have_divisible_window_grids(self):
        for name in _config_names():
            p = YParams(default_config_path(), name)
            h, w = int(p.img_size[0]), int(p.img_size[1])
            patch = int(p.patch_size)
            assert h % patch == 0 and w % patch == 0, (name, "img % patch")
            gh, gw = h // patch, w // patch
            target = (h // int(p.window_ratio), w // int(p.window_ratio))
            window, _ = calc_window_shift((gh, gw), target, (0, 0))
            assert gh % window[0] == 0, (name, gh, window)
            assert gw % window[1] == 0, (name, gw, window)

    def test_all_configs_have_consistent_channels(self):
        for name in _config_names():
            p = YParams(default_config_path(), name)
            assert len(p.channel_names) >= len(p.out_channels), name
            assert max(p.out_channels) < len(p.channel_names), name
