from fscl_tpu.models.fastspeech2 import FastSpeech2, FastSpeech2Output
