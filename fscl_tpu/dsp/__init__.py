from fscl_tpu.dsp.audio_io import load_wav, save_wav, wav_normalization
from fscl_tpu.dsp.pitch import extract_pitch, interpolate_f0, yin_f0
from fscl_tpu.dsp.textgrid import parse_textgrid, textgrid_to_segments_and_phonemes
