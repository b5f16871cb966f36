"""fscl_tpu — TPU-native few-shot cross-lingual TTS framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
hhhaaahhhaa/Few-Shot-Cross-Lingual-TTS (see SURVEY.md for the blueprint):
multilingual FastSpeech2, few-shot cross-lingual phoneme-embedding generation
(FSCL / codebook attention over SSL features), text-to-unit (T2U) systems,
SSL phoneme recognition, episodic meta-task data engine, and offline
preprocessing — built TPU-first with static shapes, segment ops, lax.scan
decoders and pjit data-parallelism over a device mesh.
"""

__version__ = "0.1.0"
