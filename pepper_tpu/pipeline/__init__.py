from .regions import build_intervals, get_chromosome_list
from .summarizer import create_region_summary
