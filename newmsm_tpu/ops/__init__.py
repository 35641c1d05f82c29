from .nearest import SearchTables, nearest_triangle, closest_vertex
