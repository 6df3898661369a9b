from .ba import bundle_adjust, BAProblem, BAResult, local_ba, global_ba
