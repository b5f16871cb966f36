from fscl_tpu.audio_out.vocoder import Vocoder, griffin_lim
