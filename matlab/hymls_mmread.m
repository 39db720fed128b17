function A = hymls_mmread(filename)
% HYMLS_MMREAD  Minimal MatrixMarket reader (sparse coordinate /
% dense array, real general) for the HYMLS bridge.
fid = fopen(filename, 'r');
if fid < 0
    error('hymls_mmread: cannot open %s', filename);
end
header = fgetl(fid);
is_sparse = ~isempty(strfind(lower(header), 'coordinate')); %#ok<STREMP>
line = fgetl(fid);
while ~isempty(line) && line(1) == '%'
    line = fgetl(fid);
end
dims = sscanf(line, '%d');
if is_sparse
    data = fscanf(fid, '%f', [3, dims(3)]);
    A = sparse(data(1, :), data(2, :), data(3, :), dims(1), dims(2));
else
    data = fscanf(fid, '%f', dims(1) * dims(2));
    A = reshape(data, dims(1), dims(2));
end
fclose(fid);
end
