function hymls_mmwrite(filename, A)
% HYMLS_MMWRITE  Minimal MatrixMarket writer (sparse coordinate /
% dense array, real general) for the HYMLS bridge.
fid = fopen(filename, 'w');
if fid < 0
    error('hymls_mmwrite: cannot open %s', filename);
end
if issparse(A)
    [i, j, v] = find(A);
    fprintf(fid, '%%%%MatrixMarket matrix coordinate real general\n');
    fprintf(fid, '%d %d %d\n', size(A, 1), size(A, 2), nnz(A));
    fprintf(fid, '%d %d %.17g\n', [i(:)'; j(:)'; v(:)']);
else
    fprintf(fid, '%%%%MatrixMarket matrix array real general\n');
    fprintf(fid, '%d %d\n', size(A, 1), size(A, 2));
    fprintf(fid, '%.17g\n', A(:));
end
fclose(fid);
end
