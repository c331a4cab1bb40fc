from .mam import create_multialignment_matrix, position_query_to_alignment
from .consensus import correct_strings
