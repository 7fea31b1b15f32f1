from .summary import PolishSummary, chunk_images, chunk_images_train
from .consensus import consensus_predict
from .stitch import stitch_chunk_predictions
