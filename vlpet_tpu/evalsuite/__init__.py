"""Task evaluators: VQA / GQA / NLVR2 / COCO caption / video.

Replaces the reference's evaluator stack (reference: src/vqa_data.py:483,
gqa_data.py:419, nlvr_data.py:394, caption_clip_data.py:401,
video/tvqa_data.py:357, video/tvc_data.py:362). The caption metrics
(BLEU/ROUGE-L/CIDEr-D) are pure-Python reimplementations of the standard
coco-caption algorithms — the reference's `language_evaluation` package is
Java-backed and unavailable here; METEOR/SPICE (Java/JAR-only) are reported
as None with a note.
"""

from vlpet_tpu.evalsuite.vqa import VQAEvaluator
from vlpet_tpu.evalsuite.gqa import GQAEvaluator
from vlpet_tpu.evalsuite.nlvr import NLVR2Evaluator
from vlpet_tpu.evalsuite.caption import COCOCaptionEvaluator, cider_d, corpus_bleu, rouge_l
from vlpet_tpu.evalsuite.video import TVQAEvaluator, TVCEvaluator
