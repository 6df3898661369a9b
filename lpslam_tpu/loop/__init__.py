from .vocab import (train_vocabulary, assign_words, bow_vector, bow_similarity, Vocabulary, save_vocabulary, load_vocabulary)
from .detector import LoopCloser, LoopConfig
from .sim3_solve import umeyama_sim3, robust_sim3_from_matches
from .pose_graph import optimize_pose_graph, PoseGraphProblem
