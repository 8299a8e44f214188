import bench
mono, poly, polyx, fast, spread = bench.bench_kirchhoff(verbose=True)
print('mono %.1f G | poly(narrow) %.1f G | poly(exact) %.1f G | fast %.1f G | spread %.2f'
      % (mono/1e9, poly/1e9, polyx/1e9, fast/1e9, spread))
