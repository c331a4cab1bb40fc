from .nn import nearest_neighbors, nearest_neighbors_2set
from .partition import star_partition, greedy_bipartite_assignment
