"""L2 kernels: radix partition, robin-hood table build/probe, radix sort
(SURVEY.md §2.1 C3-C5). The only layer that knows about VMEM tiling."""
