"""Misc utilities: vaporwave text, presets layering, config derivations."""

import numpy as np

from cvsim_tpu.config import AudioConfig, VHSSpeed
from cvsim_tpu.presets import parse_composite_flags
from cvsim_tpu.utils.vaporwave import to_vaporwave


def test_vaporwave():
    assert to_vaporwave("VHS 1986") == "ＶＨＳ　１９８６"
    assert to_vaporwave("a z") == "ａ　ｚ"


def test_preset_layering_later_flags_override():
    # -vhs sets noise 4; later -noise 10 overrides (order dependence)
    st = parse_composite_flags(["-vhs", "-noise", "10"])
    assert st.video_noise == 10 and st.emulating_vhs
    # reversed order: -vhs wins
    st = parse_composite_flags(["-noise", "10", "-vhs"])
    assert st.video_noise == 4


def test_vhs_speed_ep_derived_audio():
    st = parse_composite_flags(["-vhs-speed", "ep", "-vhs-hifi", "0"])
    assert st.vhs_tape_speed == VHSSpeed.EP
    assert st.output_audio_lowpass == 4000      # EP linear band
    assert st.output_audio_channels == 1        # linear mono
    assert st.output_audio_hiss_db == -42


def test_catv_preset_back_compensation():
    st = parse_composite_flags(["-comp-catv"])
    # gen-1: back amp 50 + (50*1.5)/4 = 68
    assert st.subcarrier_amplitude_back == 50 + int(50 * 1.5 / 4)
    st2 = parse_composite_flags(["-comp-catv"], gen2=True)
    assert st2.composite_preemphasis == 7
    assert st2.subcarrier_amplitude_back > 50


def test_hiss_level_derivation():
    assert AudioConfig(hiss_db=-72.0).hiss_level == int(10 ** (-72 / 20) * 5000)
    assert AudioConfig(hiss_db=-1000.0).hiss_level == 0


def test_vaporwave_cli_subcommand(capsys):
    from cvsim_tpu.cli.main import main

    assert main(["vaporwave", "hello world"]) == 0
    out = capsys.readouterr().out.strip()
    assert out == "\uff48\uff45\uff4c\uff4c\uff4f\u3000\uff57\uff4f\uff52\uff4c\uff44"
